"""Fused MPM substep kernel: G2P + advect + constitutive + P2G in ONE
Pallas program per particle block.

The unfused fast path (sim/solver_fast.p2g2p_fast_soa) launches two Pallas
kernels per substep (P2G, G2P) with the stress/advect/pdata glue as XLA
between them — every block pays two program/pipeline overheads and the
glue round-trips particle state through HBM each substep.  This kernel
rotates the substep boundary (the reference fuses stress into its transfer
kernels the same way, mpm_utils.py:338-527 p2g_apic_with_stress):

    K(s) = [ G2P(s) -> advect(s) -> stress(s+1) -> P2G(s+1) ]

so a frame is: stress(0)+P2G(0) prologue, then one fused kernel + one XLA
grid stage per substep, then a G2P+advect epilogue (sim/solver_fast.
simulate_substeps_fused).  The constitutive pass (svd3_rows + return
mappings, sim/constitutive_soa.py) traces directly into the kernel — it is
pure elementwise math on (PBLK,) component rows, exactly the VPU's shape.

Restrictions: particle BCs are not fused (the caller falls back to the
two-kernel path when any are present — they would have to apply between
advect and stress inside the kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixie_tpu.ops.tiling import ORIGIN, PAIRW, PBLK, U0_HI, WIN_S
from pixie_tpu.ops.transfer import (
    N_GRID_CH,
    N_VEL_CH,
    _pairs_dispatch,
    _window_factors,
)
from pixie_tpu.sim import soa
from pixie_tpu.sim.constitutive_soa import compute_stress_rows

# dynamic (carried) state rows
DX_X, DX_V, DX_C, DX_F, DX_S = 0, 3, 6, 15, 24
DX_MU, DX_LAM, DX_YS, DX_COV = 33, 34, 35, 36
DYN_CH = 48  # 42 used + pad to a sublane multiple

# static (per-frame) rows
ST_MASS, ST_VOL, ST_MAT, ST_SEL, ST_BULK = 0, 1, 2, 3, 4
STAT_CH = 8


def pack_dyn(sd: dict) -> jnp.ndarray:
    """SoA state dict -> (DYN_CH, N) carried rows."""
    n = sd["x"].shape[-1]
    rows = (
        list(soa.unpack(sd["x"])) + list(soa.unpack(sd["v"]))
        + list(soa.unpack(sd["C"])) + list(soa.unpack(sd["F"]))
        + list(soa.unpack(sd["stress"]))
        + [sd["mu"], sd["lam"], sd["yield_stress"]]
        + list(soa.unpack(sd["cov"]))
    )
    rows += [jnp.zeros((n,), jnp.float32)] * (DYN_CH - len(rows))
    return jnp.stack(rows, axis=0)


def unpack_dyn(dyn: jnp.ndarray, sd: dict) -> dict:
    """(DYN_CH, N) rows -> updated copy of the SoA dict (F_trial untouched;
    the epilogue sets it)."""
    out = dict(sd)
    out["x"] = dyn[DX_X:DX_X + 3]
    out["v"] = dyn[DX_V:DX_V + 3]
    out["C"] = dyn[DX_C:DX_C + 9]
    out["F"] = dyn[DX_F:DX_F + 9]
    out["stress"] = dyn[DX_S:DX_S + 9]
    out["mu"] = dyn[DX_MU]
    out["lam"] = dyn[DX_LAM]
    out["yield_stress"] = dyn[DX_YS]
    out["cov"] = dyn[DX_COV:DX_COV + 6]
    return out


def pack_static(sd: dict) -> jnp.ndarray:
    n = sd["x"].shape[-1]
    rows = [
        sd["mass"], sd["vol"],
        sd["material"].astype(jnp.float32),
        sd["selection"].astype(jnp.float32),
        sd["bulk"],
    ]
    rows += [jnp.zeros((n,), jnp.float32)] * (STAT_CH - len(rows))
    return jnp.stack(rows, axis=0)


def _axis_offsets(x, tc, inv_dx, axis):
    """Window-relative base + fractional offset for one axis (build_pdata
    semantics, ops/transfer.py:70-92): u0 clipped into the stored node
    window (absorbs +/-1 cell drift between resorts).  Per-axis origin
    scale: z sub-tile coordinates are in SLAB units (ops/tiling.py)."""
    gp = x * inv_dx
    base = jnp.floor(gp - 0.5)
    fx = gp - base
    u0 = jnp.clip(
        base - (tc * ORIGIN[axis] - 1).astype(jnp.float32),
        0.0, float(U0_HI[axis]),
    )
    return u0, fx


def _make_fused_kernel(cfg, dt: float, rpic: float, update_cov: bool):
    dx = cfg.dx
    inv_dx = cfg.inv_dx
    sC = inv_dx * 4.0

    def kernel(tile_ref, tc_ref, dyn_ref, stat_ref, win_ref,
               dyn_out_ref, win_out_ref, acc_ref):
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        first = jnp.logical_or(
            i == 0, tile_ref[i] != tile_ref[jnp.maximum(i - 1, 0)])
        last = jnp.logical_or(
            i == nb - 1, tile_ref[jnp.minimum(i + 1, nb - 1)] != tile_ref[i])

        d = dyn_ref[...]
        s = stat_ref[...]
        x = [d[DX_X + a] for a in range(3)]
        v = [d[DX_V + a] for a in range(3)]
        C = [d[DX_C + k] for k in range(9)]
        F = [d[DX_F + k] for k in range(9)]
        stress = [d[DX_S + k] for k in range(9)]
        mu, lam, ys = d[DX_MU], d[DX_LAM], d[DX_YS]
        cov = [d[DX_COV + k] for k in range(6)]
        mass, vol = s[ST_MASS], s[ST_VOL]
        mat, sel, bulk = s[ST_MAT], s[ST_SEL], s[ST_BULK]
        # tc_ref is the FLATTENED (3*NB,) tile-coord table: a 2-D (NB, 3)
        # SMEM scalar-prefetch operand pads its minor dim to 128 lanes
        # (NB*128*4 bytes — 2.2 MB at real-scene block counts, overflowing
        # the 1 MB SMEM; this zeroed BENCH_r03).  1-D stays NB*3*4 bytes.
        tc = [tc_ref[i * 3 + a].astype(jnp.float32) for a in range(3)]

        # ---- G2P(s): gather v / C / grad_v at x(s) ------------------------
        u0x, fxx = _axis_offsets(x[0], tc[0], inv_dx, 0)
        u0y, fxy = _axis_offsets(x[1], tc[1], inv_dx, 1)
        u0z, fxz = _axis_offsets(x[2], tc[2], inv_dx, 2)
        x1, x2, x3 = _window_factors(u0x, fxx)
        p11, p21, p12, p31, p13 = _pairs_dispatch(u0y, fxy, u0z, fxz)

        win = win_ref[0]  # (3*WIN_S, WIN_S^2) velocity window
        n = x1.shape[0]
        pair_big = jnp.concatenate([p11, p21, p12, p31, p13], axis=0)
        t_big = jax.lax.dot_general(
            pair_big, win, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        def t(vi, c):
            return t_big[vi * n:(vi + 1) * n, c * WIN_S:(c + 1) * WIN_S]

        new_v, new_C, grad = [], [], []
        for c in range(3):
            t11, t21, t12, t31, t13 = (t(0, c), t(1, c), t(2, c), t(3, c),
                                       t(4, c))
            new_v.append(jnp.sum(x1 * t11, axis=1))
            new_C.extend([
                jnp.sum(x2 * t11, axis=1) * sC,
                jnp.sum(x1 * t21, axis=1) * sC,
                jnp.sum(x1 * t12, axis=1) * sC,
            ])
            grad.extend([
                jnp.sum(x3 * t11, axis=1) * inv_dx,
                jnp.sum(x1 * t31, axis=1) * inv_dx,
                jnp.sum(x1 * t13, axis=1) * inv_dx,
            ])

        # ---- advect(s) (solver_fast.p2g2p_fast_soa ordering) --------------
        active = sel == 0.0
        v_out = soa.where_rows(active, new_v, v)
        x_out = soa.where_rows(active, [x[a] + dt * new_v[a]
                                        for a in range(3)], x)
        C_out = soa.where_rows(active, new_C, C)
        eye = soa.identity_rows(grad[0])
        a_rows = [e + g * dt for e, g in zip(eye, grad)]
        F_trial = soa.mm(a_rows, F)
        F_trial = soa.where_rows(active, F_trial, F)

        if update_cov:
            cm = [cov[0], cov[1], cov[2], cov[1], cov[3], cov[4],
                  cov[2], cov[4], cov[5]]
            gc = soa.mm(grad, cm)
            gct = soa.transpose(gc)
            cov_new = [c0 + dt * (g + gt) for c0, g, gt in zip(cm, gc, gct)]
            cov_out = soa.where_rows(
                active, [cov_new[0], cov_new[1], cov_new[2], cov_new[4],
                         cov_new[5], cov_new[8]], cov)
        else:
            cov_out = cov

        # ---- stress(s+1): constitutive pass in-kernel ---------------------
        F_out, stress_out, ys_out, mu_out, lam_out = compute_stress_rows(
            F_trial, F, stress, mat, mu, lam, ys, bulk, sel, cfg, dt,
        )

        # ---- P2G(s+1) at x(s+1) ------------------------------------------
        u0x, fxx = _axis_offsets(x_out[0], tc[0], inv_dx, 0)
        u0y, fxy = _axis_offsets(x_out[1], tc[1], inv_dx, 1)
        u0z, fxz = _axis_offsets(x_out[2], tc[2], inv_dx, 2)
        x1, x2, x3 = _window_factors(u0x, fxx)
        p11, p21, p12, p31, p13 = _pairs_dispatch(u0y, fxy, u0z, fxz)

        activef = active.astype(jnp.float32)
        m_act = mass * activef
        if abs(rpic) > 1e-9 or rpic < -0.001:
            if rpic < -0.001:
                C_p2g = [jnp.zeros_like(c) for c in C_out]
            else:
                Ct = soa.transpose(C_out)
                C_p2g = [(1.0 - rpic) * c + rpic / 2.0 * (c - ct)
                         for c, ct in zip(C_out, Ct)]
        else:
            C_p2g = C_out
        sb = m_act * dx
        ss = -(vol * activef * dt) * inv_dx

        def lefts(cols):
            return jnp.concatenate(cols, axis=1)

        # qa_c = m v_c ; qb/qs column groups as build_pdata_rows
        l11 = lefts(
            [x1 * (m_act * v_out[c])[:, None]
             + x2 * (sb * C_p2g[3 * c])[:, None]
             + x3 * (ss * stress_out[3 * c])[:, None] for c in range(3)]
            + [x1 * m_act[:, None]]
        )
        zero = jnp.zeros_like(x1)
        l21 = lefts([x1 * (sb * C_p2g[3 * c + 1])[:, None]
                     for c in range(3)] + [zero])
        l12 = lefts([x1 * (sb * C_p2g[3 * c + 2])[:, None]
                     for c in range(3)] + [zero])
        l31 = lefts([x1 * (ss * stress_out[3 * c + 1])[:, None]
                     for c in range(3)] + [zero])
        l13 = lefts([x1 * (ss * stress_out[3 * c + 2])[:, None]
                     for c in range(3)] + [zero])

        @pl.when(first)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        left_big = jnp.concatenate([l11, l21, l12, l31, l13], axis=0)
        pair_big = jnp.concatenate([p11, p21, p12, p31, p13], axis=0)
        acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
            left_big, pair_big, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(last)
        def _():
            win_out_ref[...] = acc_ref[...][None]

        # ---- write carried state -----------------------------------------
        out_rows = (x_out + v_out + C_out + F_out + stress_out
                    + [mu_out, lam_out, ys_out] + cov_out)
        out_rows = out_rows + [jnp.zeros_like(mass)] * (DYN_CH - len(out_rows))
        dyn_out_ref[...] = jnp.stack(out_rows, axis=0)

    return kernel


def fused_substep(dyn, stat, win_v, block_tile, tile_coords, cfg, dt: float,
                  n_tiles_total: int, interpret: bool = False):
    """One fused substep over all blocks.

    dyn (DYN_CH, NB*PBLK), stat (STAT_CH, NB*PBLK), win_v (T3, 3*WIN_S,
    WIN_S^2) grid-velocity windows, block_tile (NB,), tile_coords (NB, 3)
    -> (dyn', windows (T3, 4*WIN_S, WIN_S^2)) for the NEXT grid stage.
    """
    nb = block_tile.shape[0]
    tile_coords = jnp.asarray(tile_coords).reshape(-1)  # SMEM: 1-D only
    kernel = _make_fused_kernel(
        cfg, float(dt), float(cfg.rpic_damping), bool(cfg.update_cov_with_F))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((DYN_CH, PBLK), lambda i, tr, cr: (0, i)),
            pl.BlockSpec((STAT_CH, PBLK), lambda i, tr, cr: (0, i)),
            pl.BlockSpec(
                (1, N_VEL_CH * WIN_S, PAIRW),
                lambda i, tr, cr: (tr[i], 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((DYN_CH, PBLK), lambda i, tr, cr: (0, i)),
            pl.BlockSpec(
                (1, N_GRID_CH * WIN_S, PAIRW),
                lambda i, tr, cr: (tr[i], 0, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_GRID_CH * WIN_S, PAIRW), jnp.float32)
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((DYN_CH, nb * PBLK), jnp.float32),
            jax.ShapeDtypeStruct(
                (n_tiles_total, N_GRID_CH * WIN_S, PAIRW),
                jnp.float32,
            ),
        ],
        interpret=interpret,
    )(block_tile, tile_coords, dyn, stat, win_v)
