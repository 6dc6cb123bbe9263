"""Primitive (per-Gaussian) sharding via shard_map.

Projection and SH evaluation are embarrassingly parallel over Gaussians
(the reference runs them as ndrange=n kernels, rasterizer.jl:297-323); over
a mesh they shard on the `gauss` axis with zero collectives in the forward.
The *backward* of a pose-differentiable projection needs one psum: each
shard holds the pose-gradient contribution of its Gaussians (the reference
accumulates these with @atomic across all Gaussians, projection.jl:243-255;
here the cross-shard sum is an explicit ICI all-reduce).

`project_sharded` is the building block for fully-sharded rendering: its
per-Gaussian outputs stay sharded; binning/blend consume them after a
gather/all-to-all exchange (round-2 scope; SURVEY.md §2.8 tile axis).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.projection import project
from ..ops.sh import sh_to_rgb


def project_sharded(
    means, quats, scales, R_w2c, t_w2c, focal, principal_px, resolution_wh,
    *,
    mesh: Mesh,
    axis: str = "gauss",
    with_normal: bool = False,
):
    """EWA projection with Gaussians sharded over `axis`.

    means/quats/scales shard on rows (N must divide the axis size); camera
    arrays are replicated. Outputs are row-sharded per-Gaussian arrays.
    """
    fn = partial(project, with_normal=with_normal)
    spec_g = P(axis)
    spec_r = P()
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec_g, spec_g, spec_g, spec_r, spec_r, spec_r, spec_r, spec_r),
        out_specs=spec_g,
    )(means, quats, scales, R_w2c, t_w2c, focal, principal_px, resolution_wh)


def sh_to_rgb_sharded(means, shs, camera_center, degree, *, mesh: Mesh, axis: str = "gauss"):
    """SH -> RGB with Gaussians sharded over `axis`."""
    return shard_map(
        lambda m, s, c: sh_to_rgb(m, s, c, degree),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
    )(means, shs, camera_center)
