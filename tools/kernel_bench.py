"""Microbenchmark for the fused attention Pallas kernels in isolation.

The round-2 trace put the Pallas kernels at 65% of the train step while
their actual HBM traffic (~190 MB per invocation at flagship shapes) would
take <0.3 ms at v5e peak bandwidth — i.e. the kernels are latency/VPU-bound
internally, not bandwidth-bound, and the step-level "memory-bound" roofline
from XLA's analytical cost model (which counts whole gather operands) is not
the real ceiling. This tool times one kernel invocation at flagship shapes
so kernel-internal changes can be A/B'd in seconds instead of through a
full-engine build (one engine per process, CLAUDE.md).

  python tools/kernel_bench.py --name det_fwd --det 1 --bwd 0
  python tools/kernel_bench.py --name drop_fwdbwd --det 0 --bwd 1

Flagship shapes: B=1024, video stream Lq=40 over blocks (40,100), user
stream Lq=100 over blocks (100,40), d=512, H=16, bf16.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", required=True)
    p.add_argument("--which", default="proj",
                   choices=["proj", "twoblock", "xla", "layer",
                            "layer_xla", "dual"],
                   help="proj: projection-fused Pallas kernel; twoblock: "
                        "attention-only Pallas kernel; xla: materialized "
                        "jnp reference path (projections via XLA matmuls); "
                        "layer: whole-layer-stream Pallas kernel "
                        "(attention + FFN epilogue); layer_xla: the same "
                        "stream composed through XLA; dual: BOTH layer "
                        "streams in one invocation (core/dual_kernel.py — "
                        "compare its ms against the SUM of the video and "
                        "user proj rows)")
    p.add_argument("--stream", default="video", choices=["video", "user"],
                   help="video: Lq=40 blocks (40,100); user: Lq=100 (100,40)")
    p.add_argument("--lq", type=int, default=0,
                   help="override Lq (e.g. backbone2 user stream: 1)")
    p.add_argument("--l1", type=int, default=0)
    p.add_argument("--l2", type=int, default=0,
                   help="override block lengths (backbone2: l2=1)")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--nhead", type=int, default=16)
    p.add_argument("--det", type=int, default=0)
    p.add_argument("--bwd", type=int, default=1)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--out", default="/tmp/kbench.jsonl")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from segmminterest_tpu.core import attention as A

    B, d, H = args.batch, args.d_model, args.nhead
    Dh = d // H
    if args.stream == "video":
        Lq, L1, L2 = 40, 40, 100
    else:
        Lq, L1, L2 = 100, 100, 40
    Lq = args.lq or Lq
    L1 = args.l1 or L1
    L2 = args.l2 or L2

    rng = np.random.default_rng(0)
    bf16 = jnp.bfloat16
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.05, bf16)
    seed = jnp.ones((1,), jnp.int32)
    mask_q = jnp.asarray(rng.random((B, Lq)) < 0.9)
    mask_1 = jnp.asarray(rng.random((B, L1)) < 0.9)
    mask_2 = jnp.asarray(rng.random((B, L2)) < 0.9)

    if args.which == "dual":
        # merged dual-stream kernel: vid (Lv=40) + usr (Lu=100) streams in
        # one invocation; block lengths are the stream lengths themselves
        from segmminterest_tpu.core.dual_kernel import \
            fused_dual_stream_attention
        Lv, Lu = (args.l1 or 40), (args.l2 or 100)
        vid, usr = mk(B, Lv, d), mk(B, Lu, d)
        mv = jnp.asarray(rng.random((B, Lv)) < 0.9)
        mu = jnp.asarray(rng.random((B, Lu)) < 0.9)
        wsa = tuple((mk(d, d), mk(d)) for _ in range(6))
        wsb = tuple((mk(d, d), mk(d)) for _ in range(6))

        def fwd(vid, usr, wsa, wsb):
            return fused_dual_stream_attention(
                vid, usr, wsa, wsb, mv, mu, num_heads=H,
                dropout_rate=args.dropout, seed=seed,
                deterministic=bool(args.det))

        if args.bwd:
            def run(vid, usr, wsa, wsb):
                def f(vid, usr, wsa, wsb):
                    ov, ou = fwd(vid, usr, wsa, wsb)
                    return (ov.astype(jnp.float32).sum()
                            + ou.astype(jnp.float32).sum())
                return jax.grad(f, argnums=(0, 1, 2, 3))(
                    vid, usr, wsa, wsb)[0]
        else:
            run = fwd
        fn = jax.jit(run)
        cargs = (vid, usr, wsa, wsb)
    elif args.which in ("layer", "layer_xla"):
        from segmminterest_tpu.core import layer_kernel as LK

        ff = d  # flagship ff_dim == d_model (engine/train.py:73)
        xq, x1, x2 = mk(B, Lq, d), mk(B, L1, d), mk(B, L2, d)
        qkv = tuple((mk(d, d), mk(d)) for _ in range(6))
        ep = (mk(d, d), mk(d),
              jnp.ones((d,), jnp.float32), jnp.zeros((d,), jnp.float32),
              mk(d, ff), mk(ff), mk(ff, d), mk(d),
              jnp.ones((d,), jnp.float32), jnp.zeros((d,), jnp.float32))

        if args.which == "layer":
            def fwd(xq, x1, x2, qkv, ep):
                return LK.fused_layer_stream(
                    xq, x1, x2, qkv, ep, mask_q, mask_1, mask_2,
                    num_heads=H, dropout_rate=args.dropout, seed=seed,
                    deterministic=bool(args.det))
        else:
            def fwd(xq, x1, x2, qkv, ep):
                return LK.composed_layer_stream(
                    xq, x1, x2, qkv, ep, mask_q, mask_1, mask_2,
                    num_heads=H, dropout_rate=args.dropout, seed=seed,
                    deterministic=bool(args.det))

        if args.bwd:
            def run(xq, x1, x2, qkv, ep):
                def f(xq, x1, x2, qkv, ep):
                    return fwd(xq, x1, x2, qkv, ep).astype(
                        jnp.float32).sum()
                g = jax.grad(f, argnums=(0, 1, 2, 3, 4))(
                    xq, x1, x2, qkv, ep)
                return g[0]
        else:
            run = fwd
        fn = jax.jit(run)
        cargs = (xq, x1, x2, qkv, ep)
    elif args.which in ("proj", "xla"):
        xq, x1, x2 = mk(B, Lq, d), mk(B, L1, d), mk(B, L2, d)
        ws = [mk(d, d) for _ in range(6)]
        bs = [mk(d) for _ in range(6)]

        if args.which == "xla":
            # materialized path: XLA projections + jnp attention (identical
            # math; prices the Pallas kernel against plain XLA per shape)
            import math

            def fwd(xq, x1, x2, ws, bs):
                def pr(x, w, b):
                    return (x @ w + b).reshape(B, x.shape[1], H, Dh)
                q, k, v = A._two_block_concat(
                    pr(xq, ws[0], bs[0]), pr(xq, ws[1], bs[1]),
                    pr(x1, ws[2], bs[2]), pr(x2, ws[3], bs[3]),
                    pr(x1, ws[4], bs[4]), pr(x2, ws[5], bs[5]))
                mask_k = jnp.concatenate([mask_1, mask_2], axis=1)
                out = A._attention_reference(
                    q, k, v, mask_q, mask_k, args.dropout, seed,
                    bool(args.det), 1.0 / math.sqrt(Dh))
                return out.reshape(B, Lq, d)
        else:
            def fwd(xq, x1, x2, ws, bs):
                return A.fused_proj_two_block_attention(
                    xq, x1, x2, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                    ws[3], bs[3], ws[4], bs[4], ws[5], bs[5],
                    mask_q, mask_1, mask_2, num_heads=H,
                    dropout_rate=args.dropout, seed=seed,
                    deterministic=bool(args.det))

        if args.bwd:
            def run(xq, x1, x2, ws, bs):
                def f(xq, x1, x2, ws, bs):
                    return fwd(xq, x1, x2, ws, bs).astype(
                        jnp.float32).sum()
                g = jax.grad(f, argnums=(0, 1, 2, 3, 4))(xq, x1, x2, ws, bs)
                return g[0]
        else:
            run = fwd
        fn = jax.jit(run)
        cargs = (xq, x1, x2, ws, bs)
    else:
        q1, q2 = mk(B, Lq, H, Dh), mk(B, Lq, H, Dh)
        k1, v1 = mk(B, L1, H, Dh), mk(B, L1, H, Dh)
        k2, v2 = mk(B, L2, H, Dh), mk(B, L2, H, Dh)

        def fwd(q1, q2, k1, k2, v1, v2):
            return A.fused_two_block_attention(
                q1, q2, k1, k2, v1, v2, mask_q, mask_1, mask_2,
                dropout_rate=args.dropout, seed=seed,
                deterministic=bool(args.det))

        if args.bwd:
            def run(q1, q2, k1, k2, v1, v2):
                def f(*xs):
                    return fwd(*xs).astype(jnp.float32).sum()
                return jax.grad(f, argnums=tuple(range(6)))(
                    q1, q2, k1, k2, v1, v2)[0]
        else:
            run = fwd
        fn = jax.jit(run)
        cargs = (q1, q2, k1, k2, v1, v2)

    for _ in range(args.warmup):
        out = fn(*cargs)
    jax.block_until_ready(out)
    st = time.perf_counter()
    for _ in range(args.steps):
        out = fn(*cargs)
    jax.block_until_ready(out)
    ms = 1000 * (time.perf_counter() - st) / args.steps

    rec = {"name": args.name, "which": args.which, "stream": args.stream,
           "ms": round(ms, 3), "batch": B, "det": args.det,
           "bwd": args.bwd, "dropout": args.dropout,
           "block_b": A.DEFAULT_BLOCK_B}
    line = json.dumps(rec)
    print(line)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
