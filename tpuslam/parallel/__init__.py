from tpuslam.parallel.sharded_ba import batched_ba, make_mesh

__all__ = ["batched_ba", "make_mesh"]
