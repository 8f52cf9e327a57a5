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
