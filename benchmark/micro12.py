"""Which blend diverges on real TPU: Pallas (log-space T) or scan (cumprod T)?

tpu_parity showed pallas-vs-scan image max|d|=7.8e-2 on hardware (they agree
to 1e-6 in CPU interpret mode). This script binds the same binned data,
runs both implementations on the TPU, and compares each against the
sequential numpy oracle (blend_ref) on the heaviest tiles. Whichever side
carries the error tells us whether the Pallas kernel's log1p/exp chain (VPU
transcendental approximations) or the scan's cumprod is at fault.

Usage: /opt/venv/bin/python benchmark/micro12.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.constants import RADIUS_CLIP
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops import tiles as tiles_mod
    from gsplat_tpu.ops.blend_pallas import blend_pallas
    from gsplat_tpu.ops.blend_ref import blend_ref
    from gsplat_tpu.ops.blend_scan import blend_scan
    from gsplat_tpu.ops.proj_fused import project_and_sh_fused
    from gsplat_tpu.ops.rasterize import RasterizerConfig, _gather_instance_table

    rng = np.random.default_rng(0)
    n = 20_000
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(-4, 4, n)], 1
    ).astype(np.float32)
    model = GaussianModel.create(
        pts, rng.uniform(0, 1, (n, 3)).astype(np.float32),
        np.full(n, 0.02, np.float32), max_sh_degree=3,
    )
    fr = rng.normal(0, 0.3, np.asarray(model.features_rest).shape).astype(np.float32)
    model = model.replace(features_rest=jnp.asarray(fr))
    W, H = 640, 416
    R, t = look_at(np.array([7.0, 1.5, 0.5]), np.zeros(3))
    cam = Camera.create(R=R, t=t, width=W, height=H,
                        focal=np.array([0.7 * W, 0.7 * W], np.float32))
    res_wh = jnp.array([W, H], jnp.float32)
    pp = cam.principal * res_wh
    budget = 1 << 19
    cfg = RasterizerConfig(width=W, height=H, mode="rgb",
                           max_instances=budget, impl="pallas")
    grid = cfg.grid_wh

    scales = jnp.broadcast_to(jnp.exp(model.scales), (n, 3))
    shs = jnp.concatenate([model.features_dc, model.features_rest], 1)
    proj = jax.jit(lambda: project_and_sh_fused(
        model.points, model.rotations, scales, shs, cam.R, cam.t, cam.focal,
        pp, res_wh, 3, near_plane=0.2, far_plane=1e10,
        radius_clip=RADIUS_CLIP, with_normal=False))()
    binned = jax.jit(lambda: tiles_mod.build_instances(
        proj["mean_2d"], proj["depth"], proj["radius"],
        grid_wh=grid, max_instances=budget, chunk=128))()
    opa = jax.nn.sigmoid(model.masked_opacities())
    table = jax.jit(lambda: _gather_instance_table(
        binned["padded_ids"], proj["mean_2d"], proj["conic"], opa,
        proj["rgb"]))()
    ts_, tc_ = binned["tile_start"], binned["tile_count"]

    c_p, T_p, _ = jax.jit(lambda: blend_pallas(
        table, ts_, tc_, grid_wh=grid, n_feat=3))()
    c_s, T_s, _ = jax.jit(lambda: blend_scan(
        table, ts_, tc_, grid_wh=grid, n_feat=3))()
    c_p, T_p = np.asarray(c_p), np.asarray(T_p)
    c_s, T_s = np.asarray(c_s), np.asarray(T_s)

    inst_host = np.asarray(table)  # (I_pad, F) rows
    tsh, tch = np.asarray(ts_), np.asarray(tc_)

    # Heaviest 64 tiles: worst-case accumulation length. Zero the rest so the
    # pure-Python oracle only walks the examined tiles.
    order = np.argsort(-tch)[:64]
    print(f"tile counts examined (top8): {tch[order][:8].tolist()}")
    tch_sel = np.zeros_like(tch)
    tch_sel[order] = tch[order]
    c_r, T_r, _ = blend_ref(inst_host, tsh, tch_sel, grid_wh=grid, n_feat=3)

    for name, (c, T) in (("pallas", (c_p, T_p)), ("scan", (c_s, T_s))):
        dc = np.abs(c[order] - c_r[order])
        dT = np.abs(T[order] - T_r[order])
        print(f"  {name:<7} vs oracle: color max|d|={dc.max():.3e} "
              f"mean|d|={dc.mean():.3e} frac>1/255={(dc > 1/255).mean():.4f}  "
              f"T max|d|={dT.max():.3e}")

    # Transcendental accuracy probe: exp/log1p inside a trivial Pallas kernel
    # vs numpy on the exact alpha magnitudes the blend sees.
    from jax.experimental import pallas as pl

    def k(x_ref, o_ref):
        o_ref[...] = jnp.exp(jnp.log1p(-x_ref[...]) * 8.0)

    x = np.linspace(1e-4, 0.99, 1024, dtype=np.float32).reshape(8, 128)
    y_pl = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=jax.default_backend() != "tpu")(jnp.asarray(x))
    y_np = np.exp(np.log1p(-x.astype(np.float64)) * 8.0)
    rel = np.abs(np.asarray(y_pl, np.float64) - y_np) / np.maximum(y_np, 1e-30)
    print(f"  pallas exp(8*log1p(-a)) relmax={rel.max():.3e} relmean={rel.mean():.3e}")


if __name__ == "__main__":
    main()
