"""Tile machinery tests: sort/ranges and dense window combine/extract."""

import jax.numpy as jnp
import numpy as np

from pixie_tpu.ops.tiling import (
    PBLK,
    TILE,
    WIN_S,
    build_padded_layout,
    combine_windows,
    extract_windows,
    n_tiles,
    tile_id_of,
)


def test_padded_layout_covers_all_particles(rng):
    n_grid = 24
    inv_dx = n_grid / 2.0
    x = rng.uniform(0.3, 1.7, (500, 3)).astype(np.float32)
    layout = build_padded_layout(x, n_grid, inv_dx)
    perm = np.asarray(layout["perm"])
    occ = np.asarray(layout["occupied"])
    assert occ.sum() == 500
    # every particle appears exactly once among occupied slots
    assert sorted(perm[occ > 0].tolist()) == list(range(500))
    # every occupied slot belongs to its block's tile
    base = np.floor(x * inv_dx - 0.5).astype(np.int32)
    tid = np.asarray(tile_id_of(jnp.asarray(base), n_grid))
    bt = np.asarray(layout["block_tile"])
    for slot in np.where(occ > 0)[0]:
        assert tid[perm[slot]] == bt[slot // PBLK]


def test_window_grid_coordinate_mapping(rng):
    """windows[t, u] must land at grid cell TILE*t + u - 1."""
    n_grid = 32
    t = n_tiles(n_grid)
    cases = [(0, 0, 0, 1, 1, 1), (1, 2, 0, 11, 0, 9),
             (3, 3, 3, 6, 6, 2), (2, 1, 3, 0, 3, 4)]
    cases = [(min(ti, t - 1), min(tj, t - 1), min(tk, t - 1), u, v, w_)
             for (ti, tj, tk, u, v, w_) in cases]
    for (ti, tj, tk, u, v, w_) in cases:
        win = jnp.zeros((t, t, t, WIN_S, WIN_S, WIN_S, 2))
        win = win.at[ti, tj, tk, u, v, w_, :].set(1.0)
        grid = np.asarray(combine_windows(win, n_grid, 2))
        gx, gy, gz = TILE * ti + u - 1, TILE * tj + v - 1, TILE * tk + w_ - 1
        expected = np.zeros((n_grid, n_grid, n_grid, 2))
        if all(0 <= g < n_grid for g in (gx, gy, gz)):
            expected[gx, gy, gz] = 1.0
        np.testing.assert_array_equal(grid, expected)


def test_combine_accumulates_overlaps(rng):
    """Two adjacent tiles writing the same grid node must sum."""
    n_grid = 32
    t = n_tiles(n_grid)
    win = jnp.zeros((t, t, t, WIN_S, WIN_S, WIN_S, 1))
    # grid node TILE is tile 0's window u=TILE+1 and tile 1's window u=1
    win = win.at[0, 0, 0, TILE + 1, 1, 1, 0].set(2.0)
    win = win.at[1, 0, 0, 1, 1, 1, 0].set(3.0)
    grid = np.asarray(combine_windows(win, n_grid, 1))
    assert grid[TILE, 0, 0, 0] == 5.0


def test_extract_matches_padded_indexing(rng):
    n_grid = 24
    grid = jnp.asarray(rng.normal(size=(n_grid, n_grid, n_grid, 3)).astype(np.float32))
    wins = np.asarray(extract_windows(grid, n_grid))
    t = n_tiles(n_grid)
    g = np.asarray(grid)
    for (ti, tj, tk) in [(0, 0, 0), (1, 1, t - 1), (t - 1, t - 1, t - 1)]:
        for (u, v, w_) in [(0, 0, 0), (1, 4, 11), (15, 15, 15), (3, 0, 5)]:
            gx, gy, gz = TILE * ti + u - 1, TILE * tj + v - 1, TILE * tk + w_ - 1
            if all(0 <= c < n_grid for c in (gx, gy, gz)):
                np.testing.assert_array_equal(wins[ti, tj, tk, u, v, w_], g[gx, gy, gz])
            else:
                np.testing.assert_array_equal(wins[ti, tj, tk, u, v, w_], 0.0)


def test_combine_extract_adjoint(rng):
    """<extract(G), W> == <G, combine(W)> (adjointness of the dense maps)."""
    n_grid = 20
    t = n_tiles(n_grid)
    g = jnp.asarray(rng.normal(size=(n_grid, n_grid, n_grid, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(t, t, t, WIN_S, WIN_S, WIN_S, 2)).astype(np.float32))
    lhs = float(jnp.sum(extract_windows(g, n_grid) * w))
    rhs = float(jnp.sum(g * combine_windows(w, n_grid, 2)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)
