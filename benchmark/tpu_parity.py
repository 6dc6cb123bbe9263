"""REAL-TPU kernel parity check: fused prologue and Pallas blend vs the
pure-JAX oracles, on actual Mosaic-lowered kernels (the CPU suite only ever
exercises interpret mode, which cannot catch TPU-only numeric divergence —
bf16 transcendentals, rsqrt approximations, accumulation order).

Usage: /opt/venv/bin/python benchmark/tpu_parity.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from gsplat_tpu.camera import Camera, look_at
    from gsplat_tpu.constants import RADIUS_CLIP
    from gsplat_tpu.ops.proj_fused import project_and_sh_fused
    from gsplat_tpu.ops.projection import project
    from gsplat_tpu.ops.rasterize import RasterizerConfig, render
    from gsplat_tpu.ops.sh import sh_to_rgb
    from gsplat_tpu.models.gaussians import GaussianModel

    rng = np.random.default_rng(0)
    n = 20_000
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(-4, 4, n)], 1
    ).astype(np.float32)
    model = GaussianModel.create(
        pts, rng.uniform(0, 1, (n, 3)).astype(np.float32),
        np.full(n, 0.02, np.float32), max_sh_degree=3,
    )
    # Random higher-band SH so the degree>0 paths carry real signal.
    fr = rng.normal(0, 0.3, np.asarray(model.features_rest).shape).astype(np.float32)
    model = model.replace(features_rest=jnp.asarray(fr))
    W, H = 640, 416
    R, t = look_at(np.array([7.0, 1.5, 0.5]), np.zeros(3))
    cam = Camera.create(R=R, t=t, width=W, height=H,
                        focal=np.array([0.7 * W, 0.7 * W], np.float32))
    res_wh = jnp.array([W, H], jnp.float32)
    pp = cam.principal * res_wh

    # --- prologue parity -----------------------------------------------------
    scales = jnp.broadcast_to(jnp.exp(model.scales), (n, 3))
    shs = jnp.concatenate([model.features_dc, model.features_rest], 1)
    fused = jax.jit(lambda: project_and_sh_fused(
        model.points, model.rotations, scales, shs, cam.R, cam.t, cam.focal,
        pp, res_wh, 3, near_plane=0.2, far_plane=1e10,
        radius_clip=RADIUS_CLIP, with_normal=False))()
    oracle = jax.jit(lambda: project(
        model.points, model.rotations, scales, cam.R, cam.t, cam.focal,
        pp, res_wh, near_plane=0.2, far_plane=1e10))()
    rgb_o = jax.jit(lambda: sh_to_rgb(
        model.points, shs, -cam.R.T @ cam.t, 3))()
    valid = np.asarray(oracle["valid"])
    for k in ("mean_2d", "depth", "conic", "compensation"):
        a, b = np.asarray(fused[k]), np.asarray(oracle[k])
        d = np.abs(a - b)[valid]
        print(f"  prologue {k:<13} max|d|={d.max():.3e} mean|d|={d.mean():.3e}")
    d = np.abs(np.asarray(fused["rgb"]) - np.asarray(rgb_o))[valid]
    print(f"  prologue rgb           max|d|={d.max():.3e} mean|d|={d.mean():.3e}")
    rmis = int((np.asarray(fused["radius"]) != np.asarray(oracle["radius"])).sum())
    print(f"  prologue radius mismatches: {rmis}/{n}")

    # --- end-to-end render parity: pallas vs scan ---------------------------
    budget = 1 << 19
    img_p = None
    for impl in ("pallas", "scan"):
        cfg = RasterizerConfig(width=W, height=H, mode="rgb",
                               max_instances=budget, impl=impl)
        fwd = jax.jit(lambda args, cam, cfg=cfg: render(
            *args, camera=cam, config=cfg, sh_degree=3))
        img, aux = fwd(model.render_args(), cam)
        img = np.asarray(img[..., :3])
        print(f"  render[{impl}] overflow={bool(aux['overflow'])} "
              f"p_inst={int(aux['p_instances'])}")
        if img_p is None:
            img_p = img
        else:
            d = np.abs(img_p - img)
            print(f"  image pallas-vs-scan: max|d|={d.max():.3e} "
                  f"mean|d|={d.mean():.3e} frac>1/255={(d > 1/255).mean():.4f}")

    # --- gradient parity through the full render -----------------------------
    tgt = jnp.asarray(np.clip(img_p + rng.normal(0, 0.05, img_p.shape), 0, 1),
                      jnp.float32)

    grads = {}
    for impl in ("pallas", "scan"):
        cfg = RasterizerConfig(width=W, height=H, mode="rgb",
                               max_instances=budget, impl=impl)

        def loss(params, cfg=cfg):
            m = model.replace(**params)
            img, _ = render(*m.render_args(), camera=cam, config=cfg, sh_degree=3)
            return jnp.mean((img[..., :3] - tgt) ** 2)

        params = {"points": model.points, "scales": model.scales,
                  "opacities": model.opacities, "features_dc": model.features_dc,
                  "features_rest": model.features_rest}
        grads[impl] = jax.jit(jax.grad(loss))(params)
    for k in grads["pallas"]:
        a = np.asarray(grads["pallas"][k]); b = np.asarray(grads["scan"][k])
        scale = np.maximum(np.abs(b).max(), 1e-12)
        d = np.abs(a - b) / scale
        print(f"  grad {k:<14} relmax|d|={d.max():.3e} relmean|d|={d.mean():.3e}")

    # --- new Mosaic surfaces: TB-batched and sigma_mm blend kernels ----------
    # (interpret mode already proves the math; this proves the LOWERING.)
    from gsplat_tpu.ops.blend_pallas import blend_pallas
    from gsplat_tpu.ops import tiles as tiles_mod
    from gsplat_tpu.ops.rasterize import _gather_instance_table

    cfgp = RasterizerConfig(width=W, height=H, mode="rgb",
                            max_instances=budget, impl="pallas")
    proj_f = jax.jit(lambda: project_and_sh_fused(
        model.points, model.rotations, scales, shs, cam.R, cam.t, cam.focal,
        pp, res_wh, 3, near_plane=0.2, far_plane=1e10,
        radius_clip=RADIUS_CLIP, with_normal=False))()
    grid = cfgp.grid_wh
    binned = jax.jit(lambda: tiles_mod.build_instances(
        proj_f["mean_2d"], proj_f["depth"], proj_f["radius"],
        grid_wh=grid, max_instances=budget, chunk=128))()
    opa = jax.nn.sigmoid(model.masked_opacities())
    table = jax.jit(lambda: _gather_instance_table(
        binned["padded_ids"], proj_f["mean_2d"], proj_f["conic"], opa,
        proj_f["rgb"]))()
    ts_, tc_ = binned["tile_start"], binned["tile_count"]

    def bloss(i_, tb, mm):
        c, T, _ = blend_pallas(i_, ts_, tc_, grid_wh=grid, n_feat=3,
                               tiles_per_step=tb, sigma_mm=mm)
        return jnp.sum(c * c) + jnp.sum(T)

    base_out = None
    base_grad = None
    for tb, mm in ((1, False), (4, False), (1, True), (4, True)):
        try:
            out = jax.jit(lambda i_, tb=tb, mm=mm: blend_pallas(
                i_, ts_, tc_, grid_wh=grid, n_feat=3, tiles_per_step=tb,
                sigma_mm=mm))(table)
            gr = jax.jit(jax.grad(lambda i_, tb=tb, mm=mm: bloss(i_, tb, mm)))(table)
            c = np.asarray(out[0]); g = np.asarray(gr)
        except Exception as e:
            print(f"  blend tb={tb} mm={int(mm)} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}")
            continue
        if base_out is None:
            base_out, base_grad = c, g
            print(f"  blend tb={tb} mm={int(mm)} baseline ok "
                  f"(finite={np.isfinite(c).all()})")
        else:
            dc = np.abs(c - base_out).max()
            gs = np.maximum(np.abs(base_grad).max(), 1e-12)
            dg = (np.abs(g - base_grad) / gs).max()
            print(f"  blend tb={tb} mm={int(mm)} max|dcolor|={dc:.3e} "
                  f"relmax|dgrad|={dg:.3e}")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    t0 = time.time()
    main()
    print(f"total {time.time()-t0:.0f}s")
