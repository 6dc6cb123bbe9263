"""Tiny shared CLI helpers for the benchmark scripts."""
import sys


def pop_scene(args, default):
    """Extract `--scene DIR` / `--scene=DIR` from args (mutating it) and
    return the scene directory, or `default` when absent."""
    scene = default
    for tok in [a for a in args if a.startswith("--scene")]:
        i = args.index(tok)
        if tok.startswith("--scene="):
            scene = tok.split("=", 1)[1]
            del args[i]
        else:
            if i + 1 >= len(args):
                sys.exit("usage: --scene DIR (missing DIR)")
            scene = args[i + 1]
            del args[i : i + 2]
    return scene
