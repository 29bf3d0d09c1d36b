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


class TestActiveBoxLayout:
    """Occupied-bbox layout (box=True): bookkeeping invariants."""

    def _blob(self, rng, n_grid, lo, hi, n=800):
        inv_dx = n_grid / 3.0
        x = rng.uniform(lo, hi, (n, 3)).astype(np.float32) * (3.0)
        return x, inv_dx

    def test_box_contains_all_occupied_tiles_plus_halo(self, rng):
        n_grid = 96  # t = 8 tiles: a corner blob gives a proper sub-box
        inv_dx = n_grid / 3.0
        x = rng.uniform(0.05, 0.3, (800, 3)).astype(np.float32) * 3.0
        lay = build_padded_layout(x, n_grid, inv_dx, box=True)
        t = n_tiles(n_grid)
        org = np.asarray(lay["box_origin"])
        dims = np.asarray(lay["box_tiles"])
        assert (dims < t).any(), "corner blob should give a proper sub-box"
        base = np.floor(x * inv_dx - 0.5).astype(np.int32)
        tc = np.clip(base // TILE, 0, t - 1)
        # one-tile halo per side (clipped at the grid edge)
        assert (org <= np.maximum(tc.min(0) - 1, 0)).all()
        assert (org + dims - 1 >= np.minimum(tc.max(0) + 1, t - 1)).all()
        assert (dims % 2 == 0).all() or (dims == t).any()
        # block tile_coords are ABSOLUTE and inside the box
        bc = np.asarray(lay["tile_coords"])  # x/y tile units, z slab units
        from pixie_tpu.ops.tiling import NSLAB
        bz = bc[:, 2] // NSLAB
        assert (bc[:, 0] >= org[0]).all() and (bc[:, 0] < org[0] + dims[0]).all()
        assert (bc[:, 1] >= org[1]).all() and (bc[:, 1] < org[1] + dims[1]).all()
        assert (bz >= org[2]).all() and (bz < org[2] + dims[2]).all()
        assert lay["n_subtiles"] == int(dims.prod()) * NSLAB
        # every sub-tile has >= 1 block and ids are box-local
        bt = np.asarray(lay["block_tile"])
        assert set(range(lay["n_subtiles"])) <= set(bt.tolist())

    def test_box_dims_min_floor(self, rng):
        n_grid = 96
        inv_dx = n_grid / 3.0
        x = rng.uniform(0.05, 0.2, (300, 3)).astype(np.float32) * 3.0
        lay = build_padded_layout(x, n_grid, inv_dx, box=True,
                                  box_dims_min=(6, 6, 6))
        assert tuple(lay["box_tiles"]) >= (6, 6, 6)
        # floor above t clamps to t
        lay2 = build_padded_layout(x, n_grid, inv_dx, box=True,
                                   box_dims_min=(99, 99, 99))
        t = n_tiles(n_grid)
        assert tuple(lay2["box_tiles"]) == (t, t, t)

    def test_cube_layout_unchanged_without_box(self, rng):
        n_grid = 48
        inv_dx = n_grid / 2.0
        x = rng.uniform(0.3, 1.7, (500, 3)).astype(np.float32)
        a = build_padded_layout(x, n_grid, inv_dx)
        b = build_padded_layout(x, n_grid, inv_dx, box=False)
        for k in ("perm", "occupied", "block_tile", "tile_coords"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a["box_origin"] == (0, 0, 0)
        t = n_tiles(n_grid)
        assert a["box_tiles"] == (t, t, t)
