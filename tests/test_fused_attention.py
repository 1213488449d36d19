"""Fused attention kernel vs the materialized reference path: forward and
gradients, masked and unmasked, via the Pallas interpreter on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmminterest_tpu.core.attention import (_attention_reference,
                                              fused_masked_attention)


def make_inputs(rng, B=8, Lq=40, Lk=44, H=4, Dh=32):
    q = jnp.asarray(rng.normal(size=(B, Lq, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Lk, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Lk, H, Dh)), jnp.float32)
    mq = np.zeros((B, Lq), bool)
    mk = np.zeros((B, Lk), bool)
    for i in range(B):
        mq[i, : rng.integers(1, Lq + 1)] = True
        mk[i, : rng.integers(1, Lk + 1)] = True
    return q, k, v, jnp.asarray(mq), jnp.asarray(mk)


def test_forward_matches_reference(rng):
    q, k, v, mq, mk = make_inputs(rng)
    want = _attention_reference(q, k, v, mq, mk, 0.0,
                                jnp.zeros(1, jnp.int32), True,
                                1.0 / np.sqrt(q.shape[-1]))
    got = fused_masked_attention(q, k, v, mq, mk, deterministic=True,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference(rng):
    q, k, v, mq, mk = make_inputs(rng, B=4, Lq=16, Lk=24, H=2, Dh=32)

    def loss_ref(q, k, v):
        out = _attention_reference(q, k, v, mq, mk, 0.0,
                                   jnp.zeros(1, jnp.int32), True,
                                   1.0 / np.sqrt(q.shape[-1]))
        return (out ** 2).sum()

    def loss_fused(q, k, v):
        out = fused_masked_attention(q, k, v, mq, mk, deterministic=True,
                                     interpret=True)
        return (out ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_dropout_statistics(rng):
    """Train-mode dropout: ~rate of logits zeroed; fwd/bwd streams agree (the
    gradient at dropped positions must be zero)."""
    q, k, v, mq, mk = make_inputs(rng, B=4, Lq=16, Lk=24, H=2, Dh=32)
    mq = jnp.ones_like(mq, bool)
    mk = jnp.ones_like(mk, bool)
    seed = jnp.asarray([7], jnp.int32)
    out1 = fused_masked_attention(q, k, v, mq, mk, dropout_rate=0.5,
                                  seed=seed, deterministic=False,
                                  interpret=True)
    out2 = fused_masked_attention(q, k, v, mq, mk, dropout_rate=0.5,
                                  seed=seed, deterministic=False,
                                  interpret=True)
    # same seed -> identical output
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = fused_masked_attention(q, k, v, mq, mk, dropout_rate=0.5,
                                  seed=seed + 1, deterministic=False,
                                  interpret=True)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # deterministic path unaffected by seed
    det = fused_masked_attention(q, k, v, mq, mk, dropout_rate=0.5,
                                 seed=seed, deterministic=True,
                                 interpret=True)
    want = _attention_reference(q, k, v, mq, mk, 0.0, seed, True,
                                1.0 / np.sqrt(q.shape[-1]))
    np.testing.assert_allclose(np.asarray(det), np.asarray(want), rtol=2e-5,
                               atol=2e-5)
    # gradient runs without error under dropout and is finite
    g = jax.grad(lambda q: (fused_masked_attention(
        q, k, v, mq, mk, dropout_rate=0.5, seed=seed, deterministic=False,
        interpret=True) ** 2).sum())(q)
    assert np.isfinite(np.asarray(g)).all()


def test_query_padding_rows_are_softmax_of_constant(rng):
    """Fully-masked query rows produce uniform attention (exactly like the
    reference's -10000 fill) — no NaNs."""
    q, k, v, mq, mk = make_inputs(rng)
    mq = mq.at[0, :].set(False)
    got = fused_masked_attention(q, k, v, mq, mk, deterministic=True,
                                 interpret=True)
    want = _attention_reference(q, k, v, mq, mk, 0.0,
                                jnp.zeros(1, jnp.int32), True,
                                1.0 / np.sqrt(q.shape[-1]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)
    assert np.isfinite(np.asarray(got)).all()


def test_segformerx_fused_matches_unfused(rng):
    """The full encoder with fused attention (interpreted) must match the
    materialized path exactly in deterministic mode."""
    from segmminterest_tpu.models.segformerx import SegFormerX
    B, Lu, Df, D = 4, 12, 48, 64
    usr = jnp.asarray(rng.normal(size=(B, Lu, Df)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(B, 40, Df)), jnp.float32)
    usr_mask = np.zeros((B, Lu), bool)
    vid_mask = np.zeros((B, 40), bool)
    for i in range(B):
        usr_mask[i, : rng.integers(1, Lu + 1)] = True
        vid_mask[i, : rng.integers(1, 41)] = True
    usr_mask, vid_mask = jnp.asarray(usr_mask), jnp.asarray(vid_mask)

    kwargs = dict(d_model=D, num_heads=4, num_layers=3, ff_dim=96,
                  user_id_max=-1, video_id_max=-1, output_layers=[-1],
                  max_usr_len=Lu)
    base = SegFormerX(**kwargs)
    fused = SegFormerX(**kwargs, fused_attention=True, interpret=True)
    params = base.init(jax.random.PRNGKey(0), usr, usr_mask, vid, vid_mask)
    s1, _ = base.apply(params, usr, usr_mask, vid, vid_mask)
    s2, _ = fused.apply(params, usr, usr_mask, vid, vid_mask)
    np.testing.assert_allclose(np.asarray(s2[-1]), np.asarray(s1[-1]),
                               rtol=2e-4, atol=2e-4)


def test_two_block_matches_reference(rng):
    """Two-block wrapper vs the single-q materialized path using the
    concat/zero construction explicitly."""
    from segmminterest_tpu.core.attention import (_two_block_concat,
                                                  fused_two_block_attention)
    B, Lq, L1, L2, H, Dh = 4, 16, 8, 12, 2, 32
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    q1, q2 = mk(B, Lq, H, Dh), mk(B, Lq, H, Dh)
    k1, v1 = mk(B, L1, H, Dh), mk(B, L1, H, Dh)
    k2, v2 = mk(B, L2, H, Dh), mk(B, L2, H, Dh)
    mq = jnp.asarray(rng.random((B, Lq)) < 0.8)
    m1 = jnp.asarray(rng.random((B, L1)) < 0.8)
    m2 = jnp.asarray(rng.random((B, L2)) < 0.8)
    q, k, v = _two_block_concat(q1, q2, k1, k2, v1, v2)
    want = _attention_reference(q, k, v, mq, jnp.concatenate([m1, m2], 1),
                                0.0, jnp.zeros(1, jnp.int32), True,
                                1.0 / np.sqrt(Dh))
    got = fused_two_block_attention(q1, q2, k1, k2, v1, v2, mq, m1, m2,
                                    deterministic=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)
    # gradients flow through all six inputs
    def loss(q1, k2, v1):
        return (fused_two_block_attention(
            q1, q2, k1, k2, v1, v2, mq, m1, m2, deterministic=True,
            interpret=True) ** 2).sum()
    g = jax.grad(loss, argnums=(0, 1, 2))(q1, k2, v1)
    def loss_ref(q1, k2, v1):
        q, k, v = _two_block_concat(q1, q2, k1, k2, v1, v2)
        return (_attention_reference(q, k, v, mq,
                                     jnp.concatenate([m1, m2], 1), 0.0,
                                     jnp.zeros(1, jnp.int32), True,
                                     1.0 / np.sqrt(Dh)) ** 2).sum()
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q1, k2, v1)
    for a, b, name in zip(g, g_ref, ["q1", "k2", "v1"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4, err_msg=name)


def test_fuse_projections_matches_per_stream(rng):
    """fuse_projections=True (two wide QKV Denses per attention) must equal
    the 12-Dense path when the wide kernels are assembled from the small
    ones in slot order."""
    from segmminterest_tpu.models.segformerx import SegFormerX
    B, Lu, Df, D = 4, 12, 48, 64
    usr = jnp.asarray(rng.normal(size=(B, Lu, Df)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(B, 40, Df)), jnp.float32)
    usr_mask = jnp.asarray(rng.random((B, Lu)) < 0.8)
    vid_mask = jnp.asarray(rng.random((B, 40)) < 0.8)

    kwargs = dict(d_model=D, num_heads=4, num_layers=3, ff_dim=96,
                  user_id_max=-1, video_id_max=-1, output_layers=[-1],
                  max_usr_len=Lu, fused_attention=True, interpret=True)
    base = SegFormerX(**kwargs)
    wide = SegFormerX(**kwargs, fuse_projections=True)
    params = base.init(jax.random.PRNGKey(0), usr, usr_mask, vid, vid_mask)

    # slot order must mirror FourStreamAttention._fused_forward
    VID_SLOTS = [("v2v_proj", 0), ("v2v_proj", 1), ("v2v_proj", 2),
                 ("t2v_proj", 0), ("v2t_proj", 1), ("v2t_proj", 2)]
    USR_SLOTS = [("t2v_proj", 1), ("t2v_proj", 2), ("v2t_proj", 0),
                 ("t2t_proj", 0), ("t2t_proj", 1), ("t2t_proj", 2)]

    import copy
    wide_params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    for lp in wide_params["params"].values():
        if "cross_attn" not in lp:
            continue
        ca = lp["cross_attn"]
        for out_name, slots in (("vid_projs", VID_SLOTS),
                                ("usr_projs", USR_SLOTS)):
            ca[out_name] = {
                "kernel": np.concatenate(
                    [ca[f"{n}_{i}"]["kernel"] for n, i in slots], axis=1),
                "bias": np.concatenate(
                    [ca[f"{n}_{i}"]["bias"] for n, i in slots], axis=0)}
        # the per-stream Denses don't exist in the wide model's tree
        for n in ("v2v_proj", "t2v_proj", "v2t_proj", "t2t_proj"):
            for i in range(3):
                ca.pop(f"{n}_{i}")

    s1, _ = base.apply(params, usr, usr_mask, vid, vid_mask)
    s2, _ = wide.apply(wide_params, usr, usr_mask, vid, vid_mask)
    np.testing.assert_allclose(np.asarray(s2[-1]), np.asarray(s1[-1]),
                               rtol=2e-4, atol=2e-4)
    # tree shape sanity: the wide model inits to exactly this structure
    ref = wide.init(jax.random.PRNGKey(1), usr, usr_mask, vid, vid_mask)
    assert (jax.tree_util.tree_structure(ref)
            == jax.tree_util.tree_structure(
                jax.tree_util.tree_map(jnp.asarray, wide_params)))


def test_fuse_qkv_matches_unfused(rng):
    """The projection-fused kernel path shares the unfused path's parameter
    tree exactly; with identical params the outputs (and input/weight grads)
    must agree."""
    import jax
    import jax.numpy as jnp
    from segmminterest_tpu.models.segformerx import SegFormerX

    kw = dict(d_model=32, num_heads=4, num_layers=2, ff_dim=32,
              max_vid_len=12, max_usr_len=9, dropout=0.0,
              user_id_max=-1, video_id_max=-1, output_layers=[-1])
    base = SegFormerX(fused_attention=True, interpret=True, **kw)
    fq = SegFormerX(fused_attention=True, interpret=True, fuse_qkv=True,
                    **kw)
    B = 8
    usr = jnp.asarray(rng.normal(size=(B, 9, 16)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(B, 12, 16)), jnp.float32)
    um = jnp.asarray(rng.random((B, 9)) > 0.2)
    vm = jnp.asarray(rng.random((B, 12)) > 0.2)
    params = base.init(jax.random.PRNGKey(0), usr, um, vid, vm,
                       deterministic=True)["params"]
    params_fq = fq.init(jax.random.PRNGKey(0), usr, um, vid, vm,
                        deterministic=True)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_fq)

    def run(mod, p):
        states, u = mod.apply({"params": p}, usr, um, vid, vm,
                              deterministic=True)
        return states[-1], u

    s0, u0 = run(base, params)
    s1, u1 = run(fq, params)
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
    g1 = jax.grad(loss(fq))(params)
    flat0, _ = jax.tree_util.tree_flatten(g0)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("shape", [(5, 8, 7, 4, 32),    # L1 8-aligned
                                   (9, 7, 16, 4, 32),   # swap path (L2)
                                   (40, 40, 100, 16, 64),  # flagship video
                                   (100, 100, 40, 8, 64),  # flagship user
                                   (1, 40, 1, 4, 32)])     # backbone2 user
def test_proj_kernel_v2_matches_materialized(rng, shape):
    """v2 (weight-interleaved concat-KV, one QK + one AV dot per head) vs
    the composed XLA fallback and the v1 kernel: forward and all grads."""
    import jax
    import jax.numpy as jnp
    from segmminterest_tpu.core import attention as A

    Lq, L1, L2, H, d = shape
    B = 8
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    xq, x1, x2 = mk(B, Lq, d), mk(B, L1, d), mk(B, L2, d)
    ws = [mk(d, d) for _ in range(6)]
    bs = [mk(d) for _ in range(6)]
    mq = jnp.asarray(rng.random((B, Lq)) < 0.9)
    m1 = jnp.asarray(rng.random((B, L1)) < 0.9)
    m2 = jnp.asarray(rng.random((B, L2)) < 0.9)
    seed = jnp.ones((1,), jnp.int32)

    def call(version, interpret):
        def f(xq, x1, x2, ws, bs):
            out = A.fused_proj_two_block_attention(
                xq, x1, x2, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                ws[3], bs[3], ws[4], bs[4], ws[5], bs[5], mq, m1, m2,
                num_heads=H, dropout_rate=0.0, seed=seed,
                deterministic=True, interpret=interpret, version=version)
            return (out.astype(jnp.float32) ** 2).sum(), out
        (_, out), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2, 3, 4), has_aux=True)(xq, x1, x2, ws, bs)
        return out, grads

    ref_out, ref_g = call(version=None, interpret=False)  # XLA fallback
    v2_out, v2_g = call(version=2, interpret=True)
    np.testing.assert_allclose(np.asarray(v2_out), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(v2_g),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_proj_kernel_v2_explicit_unaligned_raises(rng):
    """An EXPLICIT version=2 request on shapes the v2 sublane split cannot
    handle (neither L1 nor L2 8-aligned) must raise instead of silently
    running v1 — otherwise A/B timings labeled 'v2' lie."""
    import jax.numpy as jnp
    from segmminterest_tpu.core import attention as A

    B, Lq, L1, L2, H, d = 4, 5, 7, 5, 4, 32
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    xq, x1, x2 = mk(B, Lq, d), mk(B, L1, d), mk(B, L2, d)
    ws = [mk(d, d) for _ in range(6)]
    bs = [mk(d) for _ in range(6)]
    mq = jnp.ones((B, Lq), bool)
    m1 = jnp.ones((B, L1), bool)
    m2 = jnp.ones((B, L2), bool)
    with pytest.raises(ValueError, match="multiple of 8"):
        A.fused_proj_two_block_attention(
            xq, x1, x2, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
            ws[3], bs[3], ws[4], bs[4], ws[5], bs[5], mq, m1, m2,
            num_heads=H, dropout_rate=0.0, deterministic=True,
            interpret=True, version=2)
    # ...and an explicit version=2 that would silently run the composed XLA
    # fallback (interpret=False on this CPU backend) must raise too
    with pytest.raises(ValueError, match="composed XLA path"):
        A.fused_proj_two_block_attention(
            xq, x1, x2, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
            ws[3], bs[3], ws[4], bs[4], ws[5], bs[5], mq, m1, m2,
            num_heads=H, dropout_rate=0.0, deterministic=True,
            interpret=False, version=2)


def test_proj_kernel_v2_dropout_grad_consistency(rng):
    """With dropout active the v2 backward regenerates the forward's PRNG
    stream; a central finite difference through the SAME seed must match the
    VJP gradient (a stream mismatch between fwd and bwd would break this)."""
    import jax
    import jax.numpy as jnp
    from segmminterest_tpu.core import attention as A

    B, Lq, L1, L2, H, d = 8, 5, 8, 7, 4, 32
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float64)
    xq, x1, x2 = mk(B, Lq, d), mk(B, L1, d), mk(B, L2, d)
    ws = [mk(d, d) for _ in range(6)]
    bs = [mk(d) for _ in range(6)]
    mq = jnp.ones((B, Lq), bool)
    m1 = jnp.ones((B, L1), bool)
    m2 = jnp.ones((B, L2), bool)
    seed = jnp.full((1,), 3, jnp.int32)

    def f(xq):
        out = A.fused_proj_two_block_attention(
            xq, x1, x2, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
            ws[3], bs[3], ws[4], bs[4], ws[5], bs[5], mq, m1, m2,
            num_heads=H, dropout_rate=0.3, seed=seed,
            deterministic=False, interpret=True, version=2)
        return (out.astype(jnp.float64) ** 2).sum()

    g = jax.grad(f)(xq)
    v = jnp.asarray(np.random.default_rng(5).normal(size=xq.shape))
    eps = 1e-4
    fd = (f(xq + eps * v) - f(xq - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float((g * v).sum()), float(fd),
                               rtol=2e-3)


@pytest.mark.parametrize("shape", [(5, 8, 7, 4, 32),
                                   (40, 40, 100, 16, 64),
                                   (1, 40, 1, 4, 32)])
def test_proj_kernel_v3_bwd_matches_materialized(rng, shape, monkeypatch):
    """v3 backward (parallel-grid qkv-grad kernel + XLA dx/dW chains) must
    produce the same gradients as the composed path."""
    import jax
    import jax.numpy as jnp
    from segmminterest_tpu.core import attention as A

    monkeypatch.setattr(A, "ATTN_V3_BWD", True)
    Lq, L1, L2, H, d = shape
    B = 8
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    xq, x1, x2 = mk(B, Lq, d), mk(B, L1, d), mk(B, L2, d)
    ws = [mk(d, d) for _ in range(6)]
    bs = [mk(d) for _ in range(6)]
    mq = jnp.asarray(rng.random((B, Lq)) < 0.9)
    m1 = jnp.asarray(rng.random((B, L1)) < 0.9)
    m2 = jnp.asarray(rng.random((B, L2)) < 0.9)
    seed = jnp.ones((1,), jnp.int32)

    def call(version, interpret):
        def f(xq, x1, x2, ws, bs):
            out = A.fused_proj_two_block_attention(
                xq, x1, x2, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                ws[3], bs[3], ws[4], bs[4], ws[5], bs[5], mq, m1, m2,
                num_heads=H, dropout_rate=0.0, seed=seed,
                deterministic=True, interpret=interpret, version=version)
            return (out.astype(jnp.float32) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(xq, x1, x2, ws, bs)

    ref_g = call(version=None, interpret=False)
    v3_g = call(version=1, interpret=True)
    for a, b in zip(jax.tree_util.tree_leaves(v3_g),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_proj_kernel_v3_dropout_grad_consistency(rng, monkeypatch):
    """v3 backward regenerates the forward's dropout stream; a central
    finite difference through the same seed must match the VJP gradient."""
    import jax
    import jax.numpy as jnp
    from segmminterest_tpu.core import attention as A

    monkeypatch.setattr(A, "ATTN_V3_BWD", True)
    B, Lq, L1, L2, H, d = 8, 5, 8, 7, 4, 32
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    xq, x1, x2 = mk(B, Lq, d), mk(B, L1, d), mk(B, L2, d)
    ws = [mk(d, d) for _ in range(6)]
    bs = [mk(d) for _ in range(6)]
    mq = jnp.ones((B, Lq), bool)
    m1 = jnp.ones((B, L1), bool)
    m2 = jnp.ones((B, L2), bool)
    seed = jnp.full((1,), 3, jnp.int32)

    def f(xq):
        out = A.fused_proj_two_block_attention(
            xq, x1, x2, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
            ws[3], bs[3], ws[4], bs[4], ws[5], bs[5], mq, m1, m2,
            num_heads=H, dropout_rate=0.3, seed=seed,
            deterministic=False, interpret=True, version=1)
        return (out.astype(jnp.float32) ** 2).sum()

    g = jax.grad(f)(xq)
    v = jnp.asarray(np.random.default_rng(5).normal(size=xq.shape),
                    jnp.float32)
    eps = 1e-2
    fd = (f(xq + eps * v) - f(xq - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float((g * v).sum()), float(fd), rtol=5e-3)


def test_degenerate_single_query_stream_version0_matches_kernel(rng):
    """The ID backbone's user stream is Lq=1 (max_usr_len=1); segformerx
    routes it through the composed XLA path (version=0) because the Pallas
    grid overhead exceeds the whole computation there (kernel_bench r3:
    5.1 vs 1.9 ms fwd+bwd). version=0 must be numerically identical to the
    v1 kernel on that shape — forward and all input/weight grads."""
    from segmminterest_tpu.core import attention as A

    B, Lq, L1, L2, H, d = 8, 1, 8, 1, 4, 32
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    xq, x1, x2 = mk(B, Lq, d), mk(B, L1, d), mk(B, L2, d)
    ws = [mk(d, d) for _ in range(6)]
    bs = [mk(d) for _ in range(6)]
    mq = jnp.ones((B, Lq), bool)
    m1 = jnp.asarray(rng.random((B, L1)) < 0.9)
    m2 = jnp.ones((B, L2), bool)
    seed = jnp.ones((1,), jnp.int32)

    def call(version, interpret):
        def f(xq, x1, x2, ws, bs):
            out = A.fused_proj_two_block_attention(
                xq, x1, x2, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                ws[3], bs[3], ws[4], bs[4], ws[5], bs[5], mq, m1, m2,
                num_heads=H, dropout_rate=0.0, seed=seed,
                deterministic=True, interpret=interpret, version=version)
            return (out.astype(jnp.float32) ** 2).sum(), out
        (_, out), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2, 3, 4), has_aux=True)(xq, x1, x2, ws, bs)
        return out, grads

    v0_out, v0_g = call(version=0, interpret=False)
    k_out, k_g = call(version=1, interpret=True)
    np.testing.assert_allclose(np.asarray(v0_out), np.asarray(k_out),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(v0_g),
                    jax.tree_util.tree_leaves(k_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
