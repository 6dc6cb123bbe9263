"""End-to-end rasterizer behavior (reference test category 5, runtests.jl:697+)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import Camera, RasterizerConfig, rasterize
from gsplat_tpu.ops.sh import rgb_to_sh_dc


def make_camera(w=64, h=64):
    return Camera.create(width=w, height=h, focal=np.array([60.0, 60.0], np.float32))


def make_scene(rng, n=50, depth_range=(2.0, 8.0)):
    means = np.stack(
        [
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(*depth_range, n),
        ],
        axis=1,
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.0, -1.5, size=(n, 3))).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, size=n).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    shs = np.asarray(rgb_to_sh_dc(colors))[:, None, :]
    return means, quats, scales, opac, shs


CFG = dict(width=64, height=64, max_instances=4096, chunk=8, impl="scan")


def test_forward_smoke_and_background(rng):
    means, quats, scales, opac, shs = make_scene(rng)
    cam = make_camera()
    cfg = RasterizerConfig(mode="rgb", **CFG)
    bg = jnp.array([1.0, 0.0, 0.5])
    img, aux = rasterize(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(shs),
        camera=cam, config=cfg, sh_degree=0, background=bg,
    )
    img = np.asarray(img)
    assert img.shape == (64, 64, 3)
    assert np.all(np.isfinite(img))
    assert not bool(aux["overflow"])
    alpha = np.asarray(aux["alpha"])
    assert alpha.min() >= 0.0 and alpha.max() <= 1.0
    # Where nothing was composited, the image is exactly the background.
    empty = alpha == 0.0
    if empty.any():
        np.testing.assert_allclose(
            img[empty], np.broadcast_to(np.asarray(bg), img[empty].shape), atol=1e-6
        )


def test_gradients_flow_to_all_params(rng):
    means, quats, scales, opac, shs = make_scene(rng)
    cam = make_camera()
    cfg = RasterizerConfig(mode="rgbd", **CFG)
    target = jnp.zeros((64, 64, 5))

    def loss(means, quats, scales, opac, shs):
        img, _ = rasterize(means, quats, scales, opac, shs, camera=cam, config=cfg, sh_degree=0)
        return jnp.mean((img - target) ** 2)

    args = tuple(jnp.asarray(a) for a in (means, quats, scales, opac, shs))
    grads = jax.grad(loss, argnums=tuple(range(5)))(*args)
    for name, g in zip(["means", "quats", "scales", "opac", "shs"], grads):
        g = np.asarray(g)
        assert np.all(np.isfinite(g)), f"non-finite grad for {name}"
        assert np.any(g != 0.0), f"zero grad for {name}"


def test_rgbd_depth_and_alpha_of_opaque_splat():
    """A single huge opaque splat: depth channel ≈ its camera depth where
    alpha saturates; alpha map in (0,1]."""
    cam = make_camera()
    cfg = RasterizerConfig(mode="rgbd", **CFG)
    means = jnp.array([[0.0, 0.0, 4.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), 2.0)
    opac = jnp.array([0.999])
    shs = rgb_to_sh_dc(jnp.array([[0.8, 0.2, 0.1]]))[:, None, :]
    img, aux = rasterize(means, quats, scales, opac, shs, camera=cam, config=cfg, sh_degree=0)
    img = np.asarray(img)
    c = img[32, 32]
    assert c[4] > 0.9  # alpha
    np.testing.assert_allclose(c[3] / c[4], 4.0, rtol=1e-3)  # depth / alpha


def test_rgbdn_frontoparallel_normal():
    """Flat fronto-parallel Gaussians render normal ≈ -alpha·e3 (the
    reference's :rgbdn grid test, runtests.jl:697-742)."""
    cam = make_camera()
    cfg = RasterizerConfig(mode="rgbdn", **CFG)
    n = 9
    g = np.stack(np.meshgrid(np.linspace(-1, 1, 3), np.linspace(-1, 1, 3)), -1).reshape(-1, 2)
    means = jnp.asarray(np.concatenate([g, np.full((n, 1), 4.0)], 1).astype(np.float32))
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.tile(jnp.array([[0.5, 0.5, 0.001]]), (n, 1))  # thin in z
    opac = jnp.full((n,), 0.95)
    shs = rgb_to_sh_dc(jnp.full((n, 3), 0.5))[:, None, :]
    img, aux = rasterize(means, quats, scales, opac, shs, camera=cam, config=cfg, sh_degree=0)
    img = np.asarray(img)
    assert img.shape == (64, 64, 8)
    alpha = img[..., 4]
    normal = img[..., 5:8]
    mask = alpha > 0.5
    assert mask.sum() > 100
    np.testing.assert_allclose(normal[mask][:, 2], -alpha[mask], atol=1e-3)
    np.testing.assert_allclose(normal[mask][:, :2], 0.0, atol=1e-3)


def test_pose_gradients(rng):
    """Gradients flow into R_w2c/t_w2c (pose optimization path — the
    reference's atomic vR/vt reduction, projection.jl:243-255, here a plain
    autodiff sum)."""
    means, quats, scales, opac, shs = make_scene(rng)
    cam = make_camera()
    cfg = RasterizerConfig(mode="rgb", **CFG)

    def loss(R, t):
        img, _ = rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(shs),
            camera=cam, config=cfg, sh_degree=0, R_w2c=R, t_w2c=t,
        )
        return jnp.mean(img**2)

    gR, gt = jax.grad(loss, argnums=(0, 1))(cam.R, cam.t)
    assert np.all(np.isfinite(np.asarray(gR))) and np.any(np.asarray(gR) != 0)
    assert np.all(np.isfinite(np.asarray(gt))) and np.any(np.asarray(gt) != 0)


def test_means2d_probe_gradient(rng):
    """The ∇means_2d densification statistic arrives as the gradient w.r.t.
    the zero probe (replaces the reference's persisted gstate.∇means_2d)."""
    means, quats, scales, opac, shs = make_scene(rng)
    cam = make_camera()
    cfg = RasterizerConfig(mode="rgb", **CFG)
    probe = jnp.zeros((means.shape[0], 2))

    def loss(probe):
        img, _ = rasterize(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(shs),
            camera=cam, config=cfg, sh_degree=0, means2d_probe=probe,
        )
        return jnp.mean(img**2)

    g = np.asarray(jax.grad(loss)(probe))
    assert np.all(np.isfinite(g))
    assert np.any(g != 0.0)


def test_covisibility_marks_front_not_occluded(rng):
    """A fully occluded gaussian is not covisible; the occluder is
    (reference render.jl:110-112: marked only while T > 0.5)."""
    cam = make_camera()
    cfg = RasterizerConfig(mode="rgb", **CFG)
    # Front: huge opaque splat; back: another directly behind it.
    means = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 8.0]], jnp.float32)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (2, 1))
    scales = jnp.array([[1.5, 1.5, 1.5], [0.3, 0.3, 0.3]], jnp.float32)
    opac = jnp.array([0.99, 0.9], jnp.float32)
    shs = jnp.asarray(np.asarray(rgb_to_sh_dc(np.array([[1, 0, 0], [0, 1, 0]], np.float32))))[:, None]
    img, aux = rasterize(means, quats, scales, opac, shs, camera=cam, config=cfg,
                         sh_degree=0, with_covisibility=True)
    covis = np.asarray(aux["covisibility"])
    assert bool(covis[0])
    assert not bool(covis[1])
    # Uncertainty output is exactly the alpha map.
    np.testing.assert_allclose(np.asarray(aux["uncertainty"]), np.asarray(aux["alpha"]))


def test_antialiased_compensation(rng):
    """antialiased=True multiplies opacity by the EWA blur compensation
    sqrt(det(S)/det(S+blur)): a big splat is barely affected, a sub-pixel
    splat's alpha collapses toward the dilation-dominated limit; the path
    is differentiable and off-by-default output is unchanged."""
    cam = make_camera()
    # One big splat and one NEEDLE (sub-pixel minor axis — the splat shape
    # whose aliasing the compensation exists to suppress; an isotropic
    # sub-pixel splat is already radius-culled at RADIUS_CLIP=3). Far
    # enough apart that tails don't cross the windows (columns ~50 / ~14).
    means = jnp.array([[1.2, 0.0, 4.0], [-1.2, 0.0, 4.0]], jnp.float32)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (2, 1))
    scales = jnp.array([[0.5, 0.5, 0.5], [0.3, 0.005, 0.005]], jnp.float32)
    opac = jnp.array([0.9, 0.9], jnp.float32)
    shs = jnp.asarray(np.asarray(rgb_to_sh_dc(
        np.array([[1, 0, 0], [0, 1, 0]], np.float32))))[:, None]

    cfg_off = RasterizerConfig(mode="rgbd", **CFG)
    cfg_on = RasterizerConfig(mode="rgbd", antialiased=True, **CFG)
    img_off, _ = rasterize(means, quats, scales, opac, shs, camera=cam,
                           config=cfg_off, sh_degree=0)
    img_on, aux_on = rasterize(means, quats, scales, opac, shs, camera=cam,
                               config=cfg_on, sh_degree=0)
    a_off = np.asarray(img_off[..., 4])
    a_on = np.asarray(img_on[..., 4])
    big_off, big_on = a_off[:, 46:54].max(), a_on[:, 46:54].max()
    tiny_off, tiny_on = a_off[:, 10:18].max(), a_on[:, 10:18].max()
    comp = np.asarray(aux_on["compensation"])[:2]
    assert comp[0] > 0.95, comp  # big splat: compensation ~ 1
    assert comp[1] < 0.4, comp  # sub-pixel splat: dilation-dominated
    assert abs(big_on - big_off) < 0.05 * big_off
    assert tiny_off > 0.1, tiny_off  # the tiny splat does render w/o AA
    assert tiny_on < 0.55 * tiny_off, (tiny_off, tiny_on)

    def loss(op, sc):
        img, _ = rasterize(means, quats, sc, op, shs, camera=cam,
                           config=cfg_on, sh_degree=0)
        return jnp.sum(img[..., :3] ** 2)

    g_op, g_sc = jax.grad(loss, argnums=(0, 1))(opac, scales)
    assert np.all(np.isfinite(np.asarray(g_op)))
    assert np.all(np.isfinite(np.asarray(g_sc)))
    # The tiny splat's scale gradient must include the compensation term
    # (growing it raises compensation -> nonzero even where G-term is flat).
    assert np.abs(np.asarray(g_sc)[1]).max() > 0.0


def test_tight_radius_is_output_identical(rng, monkeypatch):
    """The opacity-aware radius shrink (rasterize.py) must be an exact
    identity on image AND gradients: instances it drops are exactly the
    ones the blend's alpha >= 1/255 keep test discards. Instance demand
    must strictly shrink on a low-opacity-heavy population (the
    post-opacity-reset regime the shrink targets)."""
    means, quats, scales, opac, shs = make_scene(rng, n=120)
    # Mixed regime: half near the reset floor, some mid, some near-opaque,
    # a few straddling ALPHA_MIN-ish values.
    opac = np.concatenate([
        np.full(60, 0.012, np.float32),
        rng.uniform(0.02, 0.3, 40).astype(np.float32),
        rng.uniform(0.8, 0.999, 18).astype(np.float32),
        np.array([1.0 / 255.0 + 1e-4, 0.0050], np.float32),
    ])
    cam = make_camera()
    cfg = RasterizerConfig(mode="rgb", **CFG)

    def run():
        def loss(args):
            img, aux = rasterize(*args, camera=cam, config=cfg, sh_degree=0)
            return jnp.sum(img ** 2), (img, aux)

        args = (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
                jnp.asarray(opac), jnp.asarray(shs))
        (_, (img, aux)), g = jax.value_and_grad(loss, has_aux=True)(args)
        assert not bool(aux["overflow"])
        return np.asarray(img), [np.asarray(x) for x in g], int(aux["p_instances"])

    monkeypatch.setenv("GSPLAT_TIGHT_RADIUS", "0")
    img0, g0, demand0 = run()
    monkeypatch.setenv("GSPLAT_TIGHT_RADIUS", "1")
    img1, g1, demand1 = run()

    # Semantically an identity: every dropped instance fails the blend's
    # keep test (alpha < 1/255). Numerically, removing zero-alpha slots
    # shifts the surviving instances across chunk boundaries, regrouping
    # the per-chunk f32 reductions — tolerances cover that reorder noise
    # (measured max|d| ~6e-8 on this scene), nothing larger.
    np.testing.assert_allclose(img0, img1, rtol=0, atol=5e-6)
    for a, b in zip(g0, g1):
        scale = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(b / scale, a / scale, rtol=0, atol=1e-5)
    assert demand1 < demand0, (demand1, demand0)


def test_sub_chunk_alignment_render_identical(rng):
    """A chunk<128 (forward-only) config must produce the same image as the
    trainable chunk=128 config — same instances, same per-tile depth order,
    only the table layout differs — while demanding fewer padded slots.
    Exercises the full pipeline seam: build_instances(chunk=32) feeding the
    Pallas lane-offset forward (interpret mode on CPU)."""
    means, quats, scales, opac, shs = make_scene(rng, n=150)
    cam = make_camera()
    base = dict(width=64, height=64, mode="rgb", max_instances=8192,
                impl="pallas")
    cfg128 = RasterizerConfig(chunk=128, **base)
    cfg32 = RasterizerConfig(chunk=32, **base)
    args = (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(shs))
    img128, aux128 = rasterize(*args, camera=cam, config=cfg128, sh_degree=0)
    img32, aux32 = rasterize(*args, camera=cam, config=cfg32, sh_degree=0)
    assert not bool(aux128["overflow"]) and not bool(aux32["overflow"])
    np.testing.assert_allclose(
        np.asarray(img32), np.asarray(img128), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(aux32["n_contrib"]), np.asarray(aux128["n_contrib"])
    )
    assert int(aux32["n_instances"]) == int(aux128["n_instances"])
    # The point of the feature: alignment padding shrinks.
    assert int(aux32["p_instances"]) < int(aux128["p_instances"])
