"""Command line interface: python -m gsplat_tpu <command> ...

Replaces the reference's scripts/ (render-views.jl, gs-convert.jl) and the
headless main/benchmark entry points.
"""
import argparse
import sys


def _cli():
    p = argparse.ArgumentParser(prog="gsplat_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="headless training on a COLMAP dataset")
    t.add_argument("dataset")
    t.add_argument("--scale", type=int, default=None)
    t.add_argument("--steps", type=int, default=10_000)
    t.add_argument("--strategy", default="default", choices=["default", "mcmc", "none"])
    t.add_argument("--holdout", type=int, default=8)
    t.add_argument("--checkpoint", default=None)
    t.add_argument("--ply", default=None)
    t.add_argument("--params", default=None, help="TOML OptimizationParams file")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--max-instances", type=int, default=None)
    t.add_argument("--antialiased", action="store_true",
                   help="mip-splatting-style EWA opacity compensation")
    t.add_argument("--max-screen-size", type=int, default=None,
                   help="post-reset size-prune threshold in px (reference "
                        "default 20; 0 disables the size prune — documented "
                        "deviation, see train/strategy.py)")
    t.add_argument("--profile", default=None, metavar="DIR",
                   help="trace the first steps with the JAX profiler into DIR")

    b = sub.add_parser("benchmark", help="the 7k/30k quantized-metric protocol")
    b.add_argument("dataset")
    b.add_argument("--scale", type=int, default=None)
    b.add_argument("--steps", type=int, default=30_000)
    b.add_argument("--strategies", default="default,mcmc")
    b.add_argument("--seed", type=int, default=0)
    b.add_argument("--max-screen-size", type=int, default=None,
                   help="size-prune threshold override (see train --help)")

    r = sub.add_parser("render", help="render dataset views from a checkpoint/PLY")
    r.add_argument("model", help=".safetensors checkpoint or .ply")
    r.add_argument("dataset")
    r.add_argument("out_dir")
    r.add_argument("--scale", type=int, default=None)
    r.add_argument("--split", default="test", choices=["test", "train"])

    c = sub.add_parser("convert", help="checkpoint <-> PLY conversion")
    c.add_argument("input")
    c.add_argument("output")

    v = sub.add_parser("view", help="interactive web viewer")
    v.add_argument("model", help=".safetensors checkpoint or .ply")
    v.add_argument("--port", type=int, default=8000)
    v.add_argument(
        "--host", default="127.0.0.1",
        help="bind address (default loopback; 0.0.0.0 exposes the unauthenticated "
        "endpoint on all interfaces)",
    )
    v.add_argument("--width", type=int, default=1024)
    v.add_argument("--height", type=int, default=576)

    a = sub.add_parser("app", help="live-training web app: train + watch + steer")
    a.add_argument("dataset")
    a.add_argument("--scale", type=int, default=None)
    a.add_argument("--steps", type=int, default=30_000)
    a.add_argument("--strategy", default="default", choices=["default", "mcmc", "none"])
    a.add_argument("--holdout", type=int, default=8)
    a.add_argument("--params", default=None, help="TOML OptimizationParams file")
    a.add_argument("--seed", type=int, default=0)
    a.add_argument("--max-instances", type=int, default=None)
    a.add_argument("--port", type=int, default=8000)
    a.add_argument(
        "--host", default="127.0.0.1",
        help="bind address (default loopback; 0.0.0.0 exposes the unauthenticated "
        "endpoint on all interfaces)",
    )
    a.add_argument("--width", type=int, default=1024)
    a.add_argument("--height", type=int, default=576)
    a.add_argument("--out-dir", default=".", help="where /save writes checkpoints")
    a.add_argument("--autostart", action="store_true", help="begin training immediately")

    cp = sub.add_parser("capture", help="render a keyframed camera path to video/frames")
    cp.add_argument("model")
    cp.add_argument("path_toml")
    cp.add_argument("out", help=".mp4 or a directory for PNG frames")
    cp.add_argument("--frames", type=int, default=120)
    cp.add_argument("--fps", type=int, default=30)
    cp.add_argument("--width", type=int, default=1280)
    cp.add_argument("--height", type=int, default=720)

    ef = sub.add_parser("extract-frames", help="extract video frames for dataset prep")
    ef.add_argument("video")
    ef.add_argument("out_dir")
    ef.add_argument("--every", type=int, default=1, help="keep every Nth frame")
    ef.add_argument("--limit", type=int, default=0)

    args = p.parse_args()

    if args.cmd == "train":
        from .api import main as train_main
        from .train.params_io import load_opt_params

        opt = load_opt_params(args.params) if args.params else None
        train_main(
            args.dataset, scale=args.scale, n_steps=args.steps,
            strategy=None if args.strategy == "none" else args.strategy,
            opt_params=opt, holdout=args.holdout,
            checkpoint=args.checkpoint, ply=args.ply, seed=args.seed,
            max_instances=args.max_instances, profile_dir=args.profile,
            antialiased=args.antialiased, max_screen_size=args.max_screen_size,
        )
    elif args.cmd == "benchmark":
        from .api import benchmark

        benchmark(
            args.dataset, scale=args.scale, n_steps=args.steps,
            strategies=tuple(args.strategies.split(",")), seed=args.seed,
            max_screen_size=args.max_screen_size,
        )
    elif args.cmd == "render":
        from .api import render_views

        render_views(args.model, args.dataset, args.out_dir,
                     scale=args.scale, split=args.split)
    elif args.cmd == "convert":
        from .models.gaussians import export_ply, import_ply

        if args.input.endswith(".ply"):
            model = import_ply(args.input)
            if args.output.endswith(".ply"):
                export_ply(model, args.output)
            else:
                from .io.checkpoint import save_checkpoint
                from .train.trainer import TrainState

                save_checkpoint(args.output, TrainState.create(model))
        else:
            from .io.checkpoint import load_checkpoint

            state, _, _ = load_checkpoint(args.input)
            export_ply(state.model, args.output)
        print(f"{args.input} -> {args.output}")
    elif args.cmd == "view":
        from .viewer import Viewer

        model = _load_model(args.model)
        Viewer(model, width=args.width, height=args.height).serve(
            port=args.port, host=args.host
        )
    elif args.cmd == "app":
        import jax

        from .api import _build_trainer, standard_scale
        from .data.colmap import load_colmap
        from .train.params_io import load_opt_params
        from .viewer import TrainingViewer

        scale = args.scale or standard_scale(args.dataset)
        dataset = load_colmap(args.dataset, scale=scale, holdout=args.holdout)
        opt = load_opt_params(args.params) if args.params else None
        max_instances = args.max_instances or (
            1 << 21 if jax.default_backend() == "tpu" else 1 << 16
        )
        trainer = _build_trainer(
            dataset, opt,
            None if args.strategy == "none" else args.strategy,
            max_instances=max_instances, seed=args.seed,
        )
        tv = TrainingViewer(
            trainer, width=args.width, height=args.height,
            max_steps=args.steps, out_dir=args.out_dir,
        )
        if args.autostart:
            tv._run.set()
        tv.serve(port=args.port, host=args.host)
    elif args.cmd == "capture":
        from .camera import Camera
        from .utils.camera_path import CameraPath, capture_path
        import numpy as np

        model = _load_model(args.model)
        path = CameraPath.load(args.path_toml)
        # Keyframes carry their own intrinsics (fov per keyframe) — the base
        # camera's focal is only the fallback for legacy paths without them.
        base = Camera.create(
            width=args.width, height=args.height,
            focal=np.array([0.8 * args.width, 0.8 * args.width], np.float32),
        )
        out = capture_path(model, path, base, args.out, n_frames=args.frames, fps=args.fps)
        print(f"captured -> {out}")
    elif args.cmd == "extract-frames":
        import os

        import imageio.v2 as imageio
        from PIL import Image

        os.makedirs(args.out_dir, exist_ok=True)
        n = 0
        reader = imageio.get_reader(args.video)
        for i, frame in enumerate(reader):
            if i % args.every:
                continue
            Image.fromarray(frame).save(
                os.path.join(args.out_dir, f"frame_{n:05d}.png")
            )
            n += 1
            if args.limit and n >= args.limit:
                break
        print(f"extracted {n} frames -> {args.out_dir}")


def _load_model(path: str):
    if path.endswith(".ply"):
        from .models.gaussians import import_ply

        return import_ply(path)
    from .io.checkpoint import load_checkpoint

    state, _, _ = load_checkpoint(path)
    return state.model


if __name__ == "__main__":
    _cli()
