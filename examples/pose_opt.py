"""Recover a deliberately shifted camera pose against a frozen scene.

Mirror of the reference's standalone pose-recovery example
(/root/reference/examples/pose_opt.jl): load a trained checkpoint, shift one
training camera by 0.5 world units along +X, then optimize ONLY the pose —
the reference's reset-every-step Adam (sign steps of size lr) through the
rasterizer's pose gradients — until the rendering matches that view's
ground-truth image again.

For JOINT pose+scene optimization during training (poses in the gradient
pytree of the jitted train step), use
`OptimizationParams(use_pose_opt=True)` instead — see
tests/test_training.py::test_joint_pose_opt_training.

Usage:
  /opt/venv/bin/python examples/pose_opt.py SCENE_DIR CHECKPOINT \
      [--scale N] [--steps 500] [--view 0] [--out-frames DIR]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("checkpoint")
    ap.add_argument("--scale", type=int, default=None)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--view", type=int, default=0)
    ap.add_argument("--shift", type=float, default=0.5)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max-instances", type=int, default=1 << 18)
    ap.add_argument("--out-frames", default=None,
                    help="write side-by-side PNG frames here (reference "
                    "writes an mp4; feed these to `gsplat_tpu capture`)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsplat_tpu.api import standard_scale
    from gsplat_tpu.data.colmap import load_colmap
    from gsplat_tpu.io.checkpoint import load_checkpoint
    from gsplat_tpu.models.camera_opt import CameraOpt
    from gsplat_tpu.ops.rasterize import RasterizerConfig, render
    from gsplat_tpu.train.losses import photometric_loss

    scale = args.scale or standard_scale(args.scene)
    dataset = load_colmap(args.scene, scale=scale, holdout=0)
    state, _cam, _meta = load_checkpoint(args.checkpoint)
    model = state.model
    sh_degree = int(model.max_sh_degree)

    vid = dataset.train_ids[args.view]
    true_cam = dataset.cameras[vid]
    target = jnp.asarray(dataset.images[vid])
    # Perturb: shift along camera-local +X (reference shift!, camera.jl:136-139).
    cam = true_cam.shifted(np.array([args.shift, 0.0, 0.0], np.float32))

    impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    cfg = RasterizerConfig(
        width=true_cam.width, height=true_cam.height, mode="rgb",
        max_instances=args.max_instances, impl=impl,
    )
    copt = CameraOpt(cam, lr=args.lr)

    @jax.jit
    def step(R_w2c, t_w2c, drot, dt):
        def loss_fn(drot, dt):
            from gsplat_tpu.models.camera_opt import pose_delta

            R, t = pose_delta(R_w2c, t_w2c, drot, dt)
            img, _ = render(
                *model.render_args(), camera=cam, config=cfg,
                sh_degree=sh_degree, R_w2c=R, t_w2c=t,
            )
            return photometric_loss(img[..., :3], target)[0]

        return jax.value_and_grad(loss_fn, argnums=(0, 1))(drot, dt)

    if args.out_frames:
        os.makedirs(args.out_frames, exist_ok=True)

    for i in range(args.steps):
        p = copt.params()
        loss, (g_drot, g_dt) = step(
            copt.camera.R, copt.camera.t, p["drot"], p["dt"]
        )
        copt.apply({"drot": g_drot, "dt": g_dt})
        if i % 50 == 0 or i == args.steps - 1:
            dR = float(np.linalg.norm(np.asarray(copt.camera.R) - np.asarray(true_cam.R)))
            dt_ = float(np.linalg.norm(np.asarray(copt.camera.t) - np.asarray(true_cam.t)))
            print(f"step {i}: loss={float(loss):.5f} |dR|={dR:.4f} |dt|={dt_:.4f}",
                  flush=True)
        if args.out_frames and i % 10 == 0:
            from PIL import Image

            img, _ = render(
                *model.render_args(), camera=copt.camera, config=cfg,
                sh_degree=sh_degree,
            )
            side = np.concatenate(
                [np.asarray(img[..., :3]), np.asarray(target)], axis=1
            )
            Image.fromarray((np.clip(side, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(args.out_frames, f"f{i:05d}.png")
            )

    print(f"final pose error: |dt|="
          f"{float(np.linalg.norm(np.asarray(copt.camera.t) - np.asarray(true_cam.t))):.5f} "
          f"(started at {args.shift})")


if __name__ == "__main__":
    main()
