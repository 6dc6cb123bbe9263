"""Phase-split data-parallel backward: explicit reduce-scatter overlap.

The monolithic DP step (parallel/data_parallel.py) lets GSPMD insert ONE
per-Gaussian gradient all-reduce at the end of the backward; overlap with
compute is then only what the XLA scheduler finds (parallel/mesh.py's
ASYNC_COLLECTIVE_FLAGS). This module is the EXPLICIT spelling of SURVEY
§2.8's north star — "all-reduce over ICI overlapped with the backward" —
as a shard_map program whose collective structure the compiler cannot
miss:

  1. the local backward is split into view-microbatches (a `lax.scan`);
  2. each microbatch's per-Gaussian cotangent partials are immediately
     `psum_scatter`'d over the data axis (device d accumulates only its
     1/D row-shard of the gradient), so microbatch k's reduce-scatter DMA
     is independent of microbatch k+1's backward compute and can overlap
     it on real ICI;
  3. Adam runs on the gradient row-shard only (each device updates its
     1/D of the rows — the reduce-scatter + sharded-update + all-gather
     decomposition of a DP step, per the scaling-book recipe);
  4. one `all_gather` re-replicates the updated rows (and Adam moments).

Scope: the photometric (L1+SSIM) loss with densification stats — the path
whose gradient volume dominates (the per-Gaussian capacity rows). Optional
subsystems (bilateral/depth/sky/pose/MCMC noise) stay on the monolithic
step; this module exists to pin the overlap STRUCTURE with a CPU-mesh
parity test (tests/test_parallel.py) so it is measurable the day
multi-chip hardware is available.

The reference has no distributed layer at all (single GPU, atomic gradient
accumulation — src/rasterization/render.jl:242-282); both the collective
and its overlap are TPU-build additions.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..camera import Camera
from ..ops.rasterize import RasterizerConfig, render
from ..train.losses import photometric_loss
from ..train.optim import OptimizationParams, adam_update
from ..train.trainer import TrainState


@partial(
    jax.jit,
    static_argnames=("config", "opt_params", "camera_extent", "mesh", "n_micro"),
)
def phase_split_train_step(
    state: TrainState,
    cameras: Camera,  # batched pytree, leading axis B
    targets,  # (B, H, W, 3)
    background,  # (3,)
    sh_degree,
    *,
    config: RasterizerConfig,
    opt_params: OptimizationParams,
    camera_extent: float,
    mesh: Mesh,
    n_micro: int = 1,
):
    """One data-parallel step with the phase-split backward. Semantics match
    `data_parallel_train_step(..., features=())` — the parity test pins it —
    but the gradient collective is n_micro interleaved `psum_scatter`s plus
    a final params/moments `all_gather` instead of one GSPMD all-reduce.
    """
    (axis,) = mesh.axis_names
    D = mesh.shape[axis]
    B = targets.shape[0]
    assert B % D == 0, (B, D)
    b_local = B // D
    assert b_local % n_micro == 0, (b_local, n_micro)
    m = b_local // n_micro
    cap = state.model.capacity
    assert cap % D == 0, (cap, D)
    rows = cap // D
    p = opt_params

    def local_step(state, cameras_l, targets_l, background, sh_degree):
        params = state.model.params()
        param_keys = tuple(params)

        def micro_value_and_grads(cams_m, tgts_m):
            """Loss SUM over one microbatch's m views + grads (params, probe)."""
            probe = jnp.zeros((m, cap, 2), jnp.float32)

            def loss_fn(params, probe):
                model = state.model.replace_params(params)

                def one(probe_row, cam, tgt):
                    img, aux = render(
                        *model.render_args(),
                        camera=cam,
                        config=config,
                        sh_degree=sh_degree,
                        background=background,
                        means2d_probe=probe_row,
                    )
                    loss, parts = photometric_loss(
                        img[..., :3], tgt, p.lambda_dssim
                    )
                    return loss, (parts, aux)

                losses, (parts, aux) = jax.vmap(one, in_axes=(0, 0, 0))(
                    probe, cams_m, tgts_m
                )
                # SUM (not mean): the global 1/B lands once on the reduced
                # shard, so microbatch partials just add.
                return jnp.sum(losses), (parts, aux)

            (loss_sum, (parts, aux)), (g, g_probe) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, probe)
            return loss_sum, parts, aux, g, g_probe

        # Microbatch scan: reduce-scatter each microbatch's cotangents as
        # soon as they exist; the running accumulator is already sharded.
        res_half = jnp.array([config.width, config.height], jnp.float32) * 0.5

        def body(carry, xs):
            acc_sh, loss_s, l1_s, ssim_s, radii_mx, gacc, den, ninst, pinst, ovf = carry
            cams_m, tgts_m = xs
            loss_sum, parts, aux, g, g_probe = micro_value_and_grads(cams_m, tgts_m)
            g_sh = {
                k: jax.lax.psum_scatter(
                    v, axis, scatter_dimension=0, tiled=True
                )
                for k, v in g.items()
            }
            acc_sh = {k: acc_sh[k] + g_sh[k] for k in acc_sh}
            # Densification stats, local views only (psum'd after the scan).
            # g_probe rows are raw per-view cotangents (sum-loss, no 1/B).
            gnorm = jnp.linalg.norm(g_probe * res_half[None, None, :], axis=-1)
            visible = aux["radii"] > 0  # (m, C)
            radii_mx = jnp.maximum(
                radii_mx, jnp.max(jnp.where(visible, aux["radii"], 0), axis=0)
            )
            gacc = gacc + jnp.sum(jnp.where(visible, gnorm, 0.0), axis=0)
            den = den + jnp.sum(visible.astype(jnp.float32), axis=0)
            carry = (
                acc_sh,
                loss_s + loss_sum,
                l1_s + jnp.sum(parts["l1"]),
                ssim_s + jnp.sum(parts["ssim"]),
                radii_mx,
                gacc,
                den,
                jnp.maximum(ninst, jnp.max(aux["n_instances"])),
                jnp.maximum(pinst, jnp.max(aux["p_instances"])),
                ovf | jnp.any(aux["overflow"]),
            )
            return carry, None

        zero_sh = {
            k: jnp.zeros((rows,) + v.shape[1:], v.dtype) for k, v in params.items()
        }
        carry0 = (
            zero_sh,
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.zeros((cap,), state.max_radii.dtype),
            jnp.zeros((cap,), jnp.float32),
            jnp.zeros((cap,), jnp.float32),
            jnp.int32(0),
            jnp.int32(0),
            jnp.zeros((), bool),
        )
        stack = jax.tree_util.tree_map(
            lambda x: x.reshape((n_micro, m) + x.shape[1:]), (cameras_l, targets_l)
        )
        (acc_sh, loss_s, l1_s, ssim_s, radii_mx, gacc, den, ninst, pinst, ovf), _ = (
            jax.lax.scan(body, carry0, stack)
        )

        # Global mean over B applied once to the reduced shard.
        g_final = {k: v / B for k, v in acc_sh.items()}

        # Sharded Adam: device d updates rows [d*rows, (d+1)*rows).
        i = jax.lax.axis_index(axis)
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * rows, rows, 0)
        params_sh = {k: sl(v) for k, v in params.items()}
        opt_sh = {
            "mu": {k: sl(state.opt["mu"][k]) for k in param_keys},
            "nu": {k: sl(state.opt["nu"][k]) for k in param_keys},
            "step": state.opt["step"],
        }
        lrs = p.lrs(state.step, camera_extent)
        new_p_sh, new_opt_sh = adam_update(params_sh, g_final, opt_sh, lrs)

        # Re-replicate updated rows + moments (one all-gather each).
        ag = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
        new_params = {k: ag(v) for k, v in new_p_sh.items()}
        new_opt = {
            "mu": {k: ag(new_opt_sh["mu"][k]) for k in param_keys},
            "nu": {k: ag(new_opt_sh["nu"][k]) for k in param_keys},
            "step": new_opt_sh["step"],
        }
        # Aux groups (bilateral/sky) are out of scope; carry their moments.
        for k in state.opt["mu"]:
            if k not in param_keys:
                new_opt["mu"][k] = state.opt["mu"][k]
                new_opt["nu"][k] = state.opt["nu"][k]

        # Cross-device stat reduction (per-view accumulation semantics).
        loss = jax.lax.psum(loss_s, axis) / B
        l1_mean = jax.lax.psum(l1_s, axis) / B
        ssim_mean = jax.lax.psum(ssim_s, axis) / B
        new_max_radii = jnp.maximum(state.max_radii, jax.lax.pmax(radii_mx, axis))
        new_grad_accum = state.grad_accum + jax.lax.psum(gacc, axis)
        new_denom = state.stat_denom + jax.lax.psum(den, axis)
        n_inst = jax.lax.pmax(ninst, axis)
        p_inst = jax.lax.pmax(pinst, axis)
        overflow = jax.lax.pmax(ovf.astype(jnp.int32), axis) > 0

        new_state = state.replace(
            model=state.model.replace_params(new_params),
            opt=new_opt,
            step=state.step + 1,
            max_radii=new_max_radii,
            grad_accum=new_grad_accum,
            stat_denom=new_denom,
        )
        metrics = {
            "loss": loss,
            "l1": l1_mean,
            "ssim": ssim_mean,
            "n_instances": n_inst,
            "p_instances": p_inst,
            "overflow": overflow,
        }
        return new_state, metrics

    return shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(state, cameras, targets, background, sh_degree)
