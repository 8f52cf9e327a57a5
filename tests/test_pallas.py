"""Pallas kernel parity vs the XLA implementations (interpret mode on CPU;
the same kernels compile for the TPU Mosaic pipeline)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.kernels.image import gaussian_blur, image_gradients
from tpuslam.kernels.pallas_image import blur_pallas, gradients_pallas


class TestPallasGradients:
    def test_matches_xla(self, rng):
        img = jnp.asarray(rng.random((64, 96)) * 255.0, jnp.float32)
        gx, gy, mag, ang = image_gradients(img)
        pgx, pgy, pmag, pang = gradients_pallas(img, interpret=True)
        assert np.allclose(gx, pgx, atol=1e-5)
        assert np.allclose(gy, pgy, atol=1e-5)
        assert np.allclose(mag, pmag, atol=1e-5)
        # angle only meaningful where magnitude > 0
        m = np.asarray(mag) > 1e-3
        d = np.abs(np.asarray(ang) - np.asarray(pang))[m]
        assert d.max() < 1e-5


class TestPallasBlur:
    def test_matches_xla_interior(self, rng):
        img = jnp.asarray(rng.random((48, 64)), jnp.float32)
        a = np.asarray(gaussian_blur(img, 0.8))
        b = np.asarray(blur_pallas(img, 0.8, interpret=True))
        # interiors identical; borders differ slightly (edge-pad vs
        # renormalized taps), both valid boundary treatments
        r = 3
        assert np.allclose(a[r:-r, r:-r], b[r:-r, r:-r], atol=1e-5)
        assert np.abs(a - b).max() < 0.1


class TestPallasCCL:
    def test_matches_xla_propagation(self, rng):
        """Pallas CCL propagation == XLA scan twin on a synthetic compat
        field (identical labels and max-labels after R rounds)."""
        import jax.numpy as jnp

        from tpuslam.kernels.lsd import _ccl_xla
        from tpuslam.kernels.pallas_ccl import ccl_propagate_pallas

        H, W = 48, 128
        N = H * W
        support = rng.random((H, W)) < 0.3
        support[0, :] = support[-1, :] = support[:, 0] = support[:, -1] = False
        # random but symmetric-ish compat bits gated on support
        cb = np.zeros((H, W), np.int32)
        offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
        for d, (dy, dx) in enumerate(offs):
            ok = support & np.roll(support, (dy, dx), (0, 1)) & (rng.random((H, W)) < 0.8)
            cb |= ok.astype(np.int32) << d
        idx = np.arange(N, dtype=np.int32).reshape(H, W)
        lab0 = np.where(support, idx, N).astype(np.int32)
        mx0 = np.where(support, idx, -1).astype(np.int32)
        la, ma = _ccl_xla(jnp.asarray(lab0), jnp.asarray(mx0), jnp.asarray(cb), 12)
        lb, mb = ccl_propagate_pallas(
            jnp.asarray(lab0), jnp.asarray(mx0), jnp.asarray(cb), 12, interpret=True
        )
        assert np.array_equal(np.asarray(la), np.asarray(lb))
        assert np.array_equal(np.asarray(ma), np.asarray(mb))

    def test_detect_lines_pallas_path_matches_xla(self, rng):
        """Full detect_lines with ccl='pallas' (interpret) == ccl='xla'."""
        import jax.numpy as jnp

        from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
        from tpuslam.kernels.lsd import LSDParams, detect_lines

        scene = make_wireframe_scene(rng, n_segments=30, n_frames=1)
        img = render_wireframe_image(scene, 0, rng=rng).astype(np.float32) / 255.0
        img = img[:128, :256]
        a = detect_lines(jnp.asarray(img), 64, LSDParams(ccl="xla"))
        b = detect_lines(jnp.asarray(img), 64, LSDParams(ccl="pallas"))
        assert np.array_equal(np.asarray(a.valid), np.asarray(b.valid))
        assert np.allclose(np.asarray(a.endpoints), np.asarray(b.endpoints), atol=1e-3)
