"""Dual-stream merged kernel (core/dual_kernel.py) vs the two-call
projection-fused path: identical math, one Pallas invocation per layer.
All kernel execution via the Pallas interpreter on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmminterest_tpu.core.attention import fused_proj_two_block_attention
from segmminterest_tpu.core.dual_kernel import fused_dual_stream_attention


def make_ws(rng, d, n=6):
    return tuple((jnp.asarray(rng.normal(size=(d, d)) * 0.05, jnp.float32),
                  jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32))
                 for _ in range(n))


def make_streams(rng, B=6, Lv=12, Lu=9, d=64):
    vid = jnp.asarray(rng.normal(size=(B, Lv, d)), jnp.float32)
    usr = jnp.asarray(rng.normal(size=(B, Lu, d)), jnp.float32)
    mv = np.zeros((B, Lv), bool)
    mu = np.zeros((B, Lu), bool)
    for i in range(B):
        mv[i, : rng.integers(1, Lv + 1)] = True
        mu[i, : rng.integers(1, Lu + 1)] = True
    return vid, usr, jnp.asarray(mv), jnp.asarray(mu)


def two_call_reference(vid, usr, wsa, wsb, mv, mu, H):
    """The existing per-stream kernel called twice (interpret mode)."""
    def one(xq, ws, mq):
        (wq1, bq1), (wq2, bq2), (wk1, bk1), (wk2, bk2), (wv1, bv1), \
            (wv2, bv2) = ws
        return fused_proj_two_block_attention(
            xq, vid, usr, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2,
            wv1, bv1, wv2, bv2, mq, mv, mu, num_heads=H,
            deterministic=True, interpret=True)
    return one(vid, wsa, mv), one(usr, wsb, mu)


def test_dual_forward_matches_two_calls(rng):
    vid, usr, mv, mu = make_streams(rng)
    wsa, wsb = make_ws(rng, 64), make_ws(rng, 64)
    want_v, want_u = two_call_reference(vid, usr, wsa, wsb, mv, mu, 4)
    got_v, got_u = fused_dual_stream_attention(
        vid, usr, wsa, wsb, mv, mu, num_heads=4, deterministic=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               rtol=2e-5, atol=2e-5)


def test_dual_gradients_match_two_calls(rng):
    vid, usr, mv, mu = make_streams(rng, B=4, Lv=8, Lu=7, d=32)
    wsa, wsb = make_ws(rng, 32), make_ws(rng, 32)

    def loss_two(vid, usr, wsa, wsb):
        ov, ou = two_call_reference(vid, usr, wsa, wsb, mv, mu, 2)
        return (ov ** 2).sum() + (ou ** 2).sum()

    def loss_dual(vid, usr, wsa, wsb):
        ov, ou = fused_dual_stream_attention(
            vid, usr, wsa, wsb, mv, mu, num_heads=2, deterministic=True,
            interpret=True)
        return (ov ** 2).sum() + (ou ** 2).sum()

    g_two = jax.grad(loss_two, argnums=(0, 1, 2, 3))(vid, usr, wsa, wsb)
    g_dual = jax.grad(loss_dual, argnums=(0, 1, 2, 3))(vid, usr, wsa, wsb)
    flat_two, _ = jax.tree_util.tree_flatten(g_two)
    flat_dual, _ = jax.tree_util.tree_flatten(g_dual)
    assert len(flat_two) == len(flat_dual) == 2 + 24
    for a, b in zip(flat_dual, flat_two):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_dual_dropout_reproducible_and_distinct_streams(rng):
    """Same seed -> identical draw; different seed -> different draw; the
    two streams' interpret-mode salts must not collide (vid and usr outputs
    must not share dropout patterns where shapes coincide)."""
    d = 32
    vid, usr, mv, mu = make_streams(rng, B=4, Lv=8, Lu=8, d=d)
    mv = jnp.ones_like(mv, bool)
    mu = jnp.ones_like(mu, bool)
    # identical inputs and weights for both streams: any output difference
    # can come ONLY from the dropout salt offset
    ws = make_ws(rng, d)
    seed = jnp.asarray([11], jnp.int32)
    kw = dict(num_heads=2, dropout_rate=0.5, deterministic=False,
              interpret=True)
    ov1, ou1 = fused_dual_stream_attention(vid, vid, ws, ws, mv, mv,
                                           seed=seed, **kw)
    ov2, ou2 = fused_dual_stream_attention(vid, vid, ws, ws, mv, mv,
                                           seed=seed, **kw)
    np.testing.assert_array_equal(np.asarray(ov1), np.asarray(ov2))
    np.testing.assert_array_equal(np.asarray(ou1), np.asarray(ou2))
    assert not np.allclose(np.asarray(ov1), np.asarray(ou1))
    ov3, _ = fused_dual_stream_attention(vid, vid, ws, ws, mv, mv,
                                         seed=seed + 1, **kw)
    assert not np.allclose(np.asarray(ov1), np.asarray(ov3))
    # gradient finite under dropout
    g = jax.grad(lambda x: sum((o ** 2).sum() for o in
                               fused_dual_stream_attention(
                                   x, usr, ws, ws, mv, mu, seed=seed,
                                   **kw)))(vid)
    assert np.isfinite(np.asarray(g)).all()


def test_segformerx_fuse_dual_matches_fuse_qkv(rng):
    """fuse_dual shares fuse_qkv's parameter tree exactly; with identical
    params the outputs and all grads must agree (deterministic)."""
    from segmminterest_tpu.models.segformerx import SegFormerX

    kw = dict(d_model=32, num_heads=4, num_layers=2, ff_dim=32,
              max_vid_len=12, max_usr_len=9, dropout=0.0,
              user_id_max=-1, video_id_max=-1, output_layers=[-1])
    fq = SegFormerX(fused_attention=True, interpret=True, fuse_qkv=True,
                    **kw)
    fd = SegFormerX(fused_attention=True, interpret=True, fuse_dual=True,
                    **kw)
    B = 8
    usr = jnp.asarray(rng.normal(size=(B, 9, 16)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(B, 12, 16)), jnp.float32)
    um = jnp.asarray(rng.random((B, 9)) > 0.2)
    vm = jnp.asarray(rng.random((B, 12)) > 0.2)
    params = fq.init(jax.random.PRNGKey(0), usr, um, vid, vm,
                     deterministic=True)["params"]
    params_fd = fd.init(jax.random.PRNGKey(0), usr, um, vid, vm,
                        deterministic=True)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_fd)

    def run(mod, p):
        states, u = mod.apply({"params": p}, usr, um, vid, vm,
                              deterministic=True)
        return states[-1], u

    s0, u0 = run(fq, params)
    s1, u1 = run(fd, params)
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

    g0 = jax.grad(loss(fq))(params)
    g1 = jax.grad(loss(fd))(params)
    flat0, _ = jax.tree_util.tree_flatten(g0)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("Lv,Lu", [(12, 1), (1, 9)])
def test_fuse_dual_degenerate_stream_falls_back(rng, Lv, Lu):
    """Single-query streams route through the two-call path (which sends
    them to XLA, version=0) — outputs must still match fuse_qkv."""
    from segmminterest_tpu.models.segformerx import FourStreamAttention

    B, d = 4, 32
    vid = jnp.asarray(rng.normal(size=(B, Lv, d)), jnp.float32)
    usr = jnp.asarray(rng.normal(size=(B, Lu, d)), jnp.float32)
    mv = jnp.ones((B, Lv), bool)
    mu = jnp.ones((B, Lu), bool)
    kw = dict(d_model=d, num_heads=4, dropout=0.0, dtype=jnp.float32,
              fused=True, interpret=True)
    fq = FourStreamAttention(fuse_qkv=True, **kw)
    fd = FourStreamAttention(fuse_dual=True, **kw)
    params = fq.init(jax.random.PRNGKey(1), vid, mv, usr, mu, True)
    v0, u0 = fq.apply(params, vid, mv, usr, mu, True)
    v1, u1 = fd.apply(params, vid, mv, usr, mu, True)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=2e-5, atol=2e-5)
