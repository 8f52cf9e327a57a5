from tpuslam.slammap.map import KeyFrame, MapLineStore, SlamMap

__all__ = ["KeyFrame", "MapLineStore", "SlamMap"]
