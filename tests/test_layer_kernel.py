"""Layer-fused Pallas kernel (core/layer_kernel.py): one kernel per encoder
stream computing attention + out-proj + LN residual + exact-GELU MLP + LN
residual, with flash-style backward recompute. Verified via the Pallas
interpreter against the composed XLA path (which is itself checked against
the flax module path at the model level)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmminterest_tpu.core import layer_kernel as LK


def make_case(rng, B=8, Lq=5, L1=8, L2=7, H=4, d=32, ff=48):
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    xq, x1, x2 = mk(B, Lq, d), mk(B, L1, d), mk(B, L2, d)
    qkv = tuple((mk(d, d), mk(d)) for _ in range(6))
    ep = (mk(d, d), mk(d), mk(d) + 1.0, mk(d), mk(d, ff), mk(ff),
          mk(ff, d), mk(d), mk(d) + 1.0, mk(d))
    mq = jnp.asarray(rng.random((B, Lq)) < 0.9)
    m1 = jnp.asarray(rng.random((B, L1)) < 0.9)
    m2 = jnp.asarray(rng.random((B, L2)) < 0.9)
    return xq, x1, x2, qkv, ep, mq, m1, m2


@pytest.mark.parametrize("shape", [(5, 8, 7, 4, 32, 48),
                                   (16, 16, 8, 2, 64, 64),
                                   (40, 40, 24, 8, 64, 64)])
def test_fused_layer_matches_composed(rng, shape):
    """Kernel (interpreted) vs the composed XLA path: forward and every
    input/weight gradient, including both LayerNorms' scale/bias."""
    Lq, L1, L2, H, d, ff = shape
    xq, x1, x2, qkv, ep, mq, m1, m2 = make_case(
        rng, Lq=Lq, L1=L1, L2=L2, H=H, d=d, ff=ff)
    seed = jnp.ones((1,), jnp.int32)
    # random linear functional, NOT sum-of-squares: for loss = sum(y2^2)
    # the cotangent dy2 is proportional to LN2's own xhat, which lies in
    # the LayerNorm backward's null space — every upstream gradient would
    # cancel to rounding residue and the comparison would be vacuous
    W = jnp.asarray(np.random.default_rng(9).normal(size=(8, Lq, d)),
                    jnp.float32)

    def call(interpret):
        def f(xq, x1, x2, qkv, ep):
            out = LK.fused_layer_stream(
                xq, x1, x2, qkv, ep, mq, m1, m2, num_heads=H,
                dropout_rate=0.0, seed=seed, deterministic=True,
                interpret=interpret)
            return (out.astype(jnp.float32) * W).sum(), out
        (_, out), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2, 3, 4), has_aux=True)(xq, x1, x2, qkv, ep)
        return out, grads

    ref_out, ref_g = call(False)   # composed XLA fallback
    k_out, k_g = call(True)        # interpreted kernel
    np.testing.assert_allclose(np.asarray(k_out), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(k_g),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=6e-4, atol=6e-4)


def test_fused_layer_dropout_grad_consistency(rng):
    """The backward regenerates the forward's PRNG draws (attention logits
    dropout AND the three epilogue dropouts); a central finite difference
    through the SAME seed must match the VJP gradient."""
    xq, x1, x2, qkv, ep, _, _, _ = make_case(rng, ff=32)
    B, Lq = xq.shape[0], xq.shape[1]
    mq = jnp.ones((B, Lq), bool)
    m1 = jnp.ones((B, x1.shape[1]), bool)
    m2 = jnp.ones((B, x2.shape[1]), bool)
    seed = jnp.full((1,), 3, jnp.int32)

    def f(xq):
        out = LK.fused_layer_stream(
            xq, x1, x2, qkv, ep, mq, m1, m2, num_heads=4,
            dropout_rate=0.3, seed=seed, deterministic=False,
            interpret=True)
        return (out.astype(jnp.float32) ** 2).sum()

    g = jax.grad(f)(xq)
    v = jnp.asarray(np.random.default_rng(5).normal(size=xq.shape),
                    jnp.float32)
    eps = 1e-2
    fd = (f(xq + eps * v) - f(xq - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float((g * v).sum()), float(fd), rtol=5e-3)


def test_fused_layer_dropout_determinism(rng):
    """Same seed -> identical output; different seed -> different output;
    deterministic mode matches the composed deterministic path."""
    xq, x1, x2, qkv, ep, mq, m1, m2 = make_case(rng)
    seed = jnp.full((1,), 7, jnp.int32)
    call = lambda s, det: LK.fused_layer_stream(
        xq, x1, x2, qkv, ep, mq, m1, m2, num_heads=4, dropout_rate=0.4,
        seed=s, deterministic=det, interpret=True)
    o1, o2 = call(seed, False), call(seed, False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(call(seed + 1, False)))
    det = call(seed, True)
    want = LK.composed_layer_stream(
        xq, x1, x2, qkv, ep, mq, m1, m2, num_heads=4, dropout_rate=0.0,
        deterministic=True)
    np.testing.assert_allclose(np.asarray(det), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_gelu_polynomial_matches_exact():
    """The in-kernel Abramowitz-Stegun GELU (Mosaic has no erf) vs
    jax.nn.gelu(approximate=False), value and derivative."""
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(LK._gelu_f32(x)),
                               np.asarray(jax.nn.gelu(x, approximate=False)),
                               atol=1e-6)
    g_ref = jax.vmap(jax.grad(lambda t: jax.nn.gelu(t, approximate=False)))(x)
    np.testing.assert_allclose(np.asarray(LK._gelu_grad_f32(x)),
                               np.asarray(g_ref), atol=2e-6)


def test_degenerate_single_query_routes_to_composed(rng):
    """Lq == 1 (the ID backbone's usr stream) must route to the composed XLA
    path off-interpret and still agree with the interpreted kernel."""
    xq, x1, x2, qkv, ep, _, m1, m2 = make_case(rng, Lq=1, L2=1)
    B = xq.shape[0]
    mq = jnp.ones((B, 1), bool)
    m2 = jnp.ones((B, 1), bool)

    def f(interpret):
        return LK.fused_layer_stream(
            xq, x1, x2, qkv, ep, mq, m1, m2, num_heads=4,
            dropout_rate=0.0, deterministic=True, interpret=interpret)

    np.testing.assert_allclose(np.asarray(f(True)), np.asarray(f(False)),
                               rtol=2e-4, atol=2e-5)


def test_segformerx_fuse_layer_matches_fuse_qkv(rng):
    """SegFormerX(fuse_layer=True) shares the composed path's parameter tree
    exactly; with identical params the outputs and all parameter grads must
    match the fuse_qkv path."""
    from segmminterest_tpu.models.segformerx import SegFormerX

    kw = dict(d_model=32, num_heads=4, num_layers=2, ff_dim=48,
              max_vid_len=12, max_usr_len=9, dropout=0.0,
              user_id_max=-1, video_id_max=-1, output_layers=[-1])
    base = SegFormerX(fused_attention=True, fuse_qkv=True, interpret=True,
                      **kw)
    fl = SegFormerX(fuse_layer=True, interpret=True, **kw)
    B = 8
    usr = jnp.asarray(rng.normal(size=(B, 9, 16)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(B, 12, 16)), jnp.float32)
    um = jnp.asarray(rng.random((B, 9)) > 0.2)
    vm = jnp.asarray(rng.random((B, 12)) > 0.2)
    params = base.init(jax.random.PRNGKey(0), usr, um, vid, vm,
                       deterministic=True)["params"]
    params_fl = fl.init(jax.random.PRNGKey(0), usr, um, vid, vm,
                        deterministic=True)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_fl))

    def run(mod, p):
        states, u = mod.apply({"params": p}, usr, um, vid, vm,
                              deterministic=True)
        return states[-1], u

    s0, u0 = run(base, params)
    s1, u1 = run(fl, params)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=2e-4, atol=2e-5)

    def loss(mod):
        def f(p):
            states, u = mod.apply({"params": p}, usr, um, vid, vm,
                                  deterministic=True)
            return (states[-1] ** 2).sum() + (u ** 2).sum()
        return f

    g0 = jax.grad(loss(base))(params)
    g1 = jax.grad(loss(fl))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=6e-4, atol=6e-4)


def test_fuse_layer_suppresses_whole_layer_remat(rng):
    """fuse_layer saves only the layer inputs and recomputes the forward
    inside its backward kernel, so layer-scope nn.remat on top would replay
    every layer forward a third time per step. SegFormerX must drop the
    remat wrapper when the fused path is active (and keep it otherwise)."""
    from segmminterest_tpu.models.segformerx import SegFormerX

    kw = dict(d_model=32, num_heads=4, num_layers=2, ff_dim=48,
              max_vid_len=12, max_usr_len=9, dropout=0.0,
              user_id_max=-1, video_id_max=-1, output_layers=[-1],
              remat=True, remat_scope="layer", interpret=True)
    B = 4
    usr = jnp.asarray(rng.normal(size=(B, 9, 16)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(B, 12, 16)), jnp.float32)
    um = jnp.ones((B, 9), bool)
    vm = jnp.ones((B, 12), bool)

    def grad_jaxpr(mod):
        params = mod.init(jax.random.PRNGKey(0), usr, um, vid, vm,
                          deterministic=True)["params"]

        def f(p):
            states, u = mod.apply({"params": p}, usr, um, vid, vm,
                                  deterministic=True)
            return (states[-1] ** 2).sum() + (u ** 2).sum()

        return str(jax.make_jaxpr(jax.grad(f))(params))

    # sanity: the detector sees nn.remat on the composed path
    assert "remat" in grad_jaxpr(SegFormerX(**kw))
    # the fused-layer path must not be wrapped in remat
    assert "remat" not in grad_jaxpr(SegFormerX(fuse_layer=True, **kw))
    # ...but an ablated run falls back to the composed layer and keeps it
    assert "remat" in grad_jaxpr(
        SegFormerX(fuse_layer=True, ablation="woCrossAtt", **kw))
    # ...and so does fuse_layer OFF the kernel path (interpret=False on
    # this CPU backend routes fused_layer_stream to the composed XLA path,
    # where standard autodiff saves activations — remat must stay)
    kw_no_interp = dict(kw, interpret=False)
    assert "remat" in grad_jaxpr(SegFormerX(fuse_layer=True, **kw_no_interp))


def test_segformerx_fuse_layer_id_backbone_smoke(rng):
    """ID backbone shapes (usr stream Lq=1 -> composed route inside the
    wrapper) train-mode smoke: finite loss and grads through the embed."""
    from segmminterest_tpu.models.segformerx import SegFormerX

    mod = SegFormerX(d_model=32, num_heads=4, num_layers=2, ff_dim=32,
                     max_vid_len=12, max_usr_len=1, dropout=0.1,
                     user_id_max=50, video_id_max=90, output_layers=[-1],
                     fuse_layer=True, interpret=True)
    B = 8
    usr = jnp.asarray(rng.integers(0, 50, size=(B,)), jnp.int32)
    vid = jnp.asarray(rng.integers(0, 90, size=(B,)), jnp.int32)
    um = jnp.ones((B, 1), bool)
    vm = jnp.asarray(rng.random((B, 12)) > 0.2)
    variables = mod.init(jax.random.PRNGKey(0), usr, um, vid, vm,
                         deterministic=True)

    def f(p):
        states, u = mod.apply(
            {"params": p}, usr, um, vid, vm, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)})
        return (states[-1] ** 2).sum() + (u ** 2).sum()

    loss, g = jax.value_and_grad(f)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
