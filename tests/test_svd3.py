"""svd3 correctness vs. jnp.linalg.svd and the Warp sign conventions."""

import jax.numpy as jnp
import numpy as np
import pytest

from pixie_tpu.sim.svd3 import polar_rotation, svd3


def random_f(rng, n, scale=1.0, near_identity=False):
    if near_identity:
        return np.eye(3, dtype=np.float32) + 0.2 * rng.normal(size=(n, 3, 3)).astype(np.float32)
    return (scale * rng.normal(size=(n, 3, 3))).astype(np.float32)


@pytest.mark.parametrize("near_identity", [True, False])
def test_reconstruction(rng, near_identity):
    f = random_f(rng, 256, near_identity=near_identity)
    u, s, v = svd3(jnp.asarray(f))
    recon = np.einsum("nij,nj,nkj->nik", np.asarray(u), np.asarray(s), np.asarray(v))
    np.testing.assert_allclose(recon, f, atol=2e-4, rtol=1e-3)


def test_orthogonality_and_proper_rotations(rng):
    f = random_f(rng, 256)
    u, s, v = svd3(jnp.asarray(f))
    u, v = np.asarray(u), np.asarray(v)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), u.shape)
    np.testing.assert_allclose(np.einsum("nij,nkj->nik", u, u), eye, atol=2e-4)
    np.testing.assert_allclose(np.einsum("nij,nkj->nik", v, v), eye, atol=2e-4)
    # Warp convention: U and V proper rotations
    np.testing.assert_allclose(np.linalg.det(u), 1.0, atol=2e-4)
    np.testing.assert_allclose(np.linalg.det(v), 1.0, atol=2e-4)


def test_sigma_sign_convention(rng):
    """sigma sorted descending; sigma[2] carries sign(det F)."""
    f = random_f(rng, 256)
    _, s, _ = svd3(jnp.asarray(f))
    s = np.asarray(s)
    assert (s[:, 0] >= s[:, 1] - 1e-5).all()
    assert (s[:, 1] >= np.abs(s[:, 2]) - 1e-5).all()
    det = np.linalg.det(f)
    assert (np.sign(s[:, 2]) == np.sign(det)).all()


def test_matches_lapack_singular_values(rng):
    f = random_f(rng, 128)
    _, s, _ = svd3(jnp.asarray(f))
    s_ref = np.linalg.svd(f.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(np.abs(np.asarray(s)), s_ref, atol=5e-4, rtol=1e-3)


def test_degenerate_cases():
    f = jnp.stack(
        [
            jnp.zeros((3, 3)),                      # zero matrix
            jnp.eye(3),                             # identity
            jnp.diag(jnp.array([1.0, 1.0, 0.0])),   # rank 2
            jnp.diag(jnp.array([2.0, 0.0, 0.0])),   # rank 1
            jnp.diag(jnp.array([1.0, 1.0, 1.0])) * 1e-8,  # tiny
            jnp.diag(jnp.array([3.0, 3.0, 3.0])),   # repeated sv
        ]
    ).astype(jnp.float32)
    u, s, v = svd3(f)
    recon = np.einsum("nij,nj,nkj->nik", np.asarray(u), np.asarray(s), np.asarray(v))
    np.testing.assert_allclose(recon, np.asarray(f), atol=1e-5)
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(np.asarray(v)).all()


def test_polar_rotation_identity(rng):
    # F = R S -> polar_rotation recovers R for pure rotations
    theta = 0.3
    r = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
        np.float32,
    )
    stretch = np.diag([1.5, 0.7, 1.1]).astype(np.float32)
    f = (r @ stretch)[None].repeat(4, 0)
    r_out = np.asarray(polar_rotation(jnp.asarray(f)))
    np.testing.assert_allclose(r_out, r[None].repeat(4, 0), atol=1e-4)
