"""Micro-benchmark for the fused SA pair kernels at production shapes.

Honest tunnel timing (see bench.py): N chained kernel calls inside one jit
with a data dependence between iterations, one scalar fetched at the end.
Reports per-call latency for the forward kernel (with winner export, i.e.
the training forward) and optionally the fused backward.

Usage:
    python -m eda_tpu.tools.sa_kernel_bench --layer sa1 --batch 32
    python -m eda_tpu.tools.sa_kernel_bench --layer sa1 --batch 32 --bwd
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

# production SA layer shapes (ModelConfig defaults: N=50000, npoints/radii/
# mlps from Pointnet2Backbone, sa_windows=(1024, 256, 256, 256))
LAYERS = {
    # name: (N, M, radius, window, c_in(A's c1), widths)
    "sa1": (50000, 2048, 0.2, 1024, 64, (64, 64, 128)),
    "sa2": (2048, 1024, 0.4, 256, 128, (128, 128, 256)),
    "sa3": (1024, 512, 0.8, 256, 128, (128, 128, 256)),
    "sa4": (512, 256, 1.2, 256, 128, (128, 128, 256)),
}


def make_inputs(layer: str, B: int, seed: int = 0, scenes: bool = False):
    from eda_tpu.ops.fused_sa import morton_keys

    N, M, radius, W, c1, widths = LAYERS[layer]
    rng = np.random.default_rng(seed)
    if scenes:
        # bench.py's synthetic-scene geometry + the backbone's own FPS chain
        # (round-3 advisor item: linspace ranks understate window-start
        # irregularity; this mode replays eda_tpu.utils.flops.sa_chain down
        # to the requested layer on real scene clouds)
        from eda_tpu.config import ModelConfig
        from eda_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
        from eda_tpu.utils.flops import sa_chain

        cfg = ModelConfig()
        gen = SyntheticScenes(
            SyntheticConfig(
                num_points=cfg.num_points, num_objects=8, text_len=64,
                max_objects=cfg.max_detected_boxes,
            ),
            vocab_size=cfg.text_vocab_size,
        )
        pcs = np.stack(
            [gen.scene(i)["point_clouds"][:, :3] for i in range(B)]
        )
        want = int(layer[-1]) - 1
        for li, (g, layer_xyz, layer_ranks) in enumerate(
            sa_chain(pcs, cfg, max_scenes=B)
        ):
            if li == want:
                assert (g.n, g.m, g.w) == (N, M, W), (g, LAYERS[layer])
                xyz, ranks = layer_xyz, layer_ranks.astype(np.int64)
                break
    else:
        xyz = rng.uniform(0, 5.0, (B, N, 3)).astype(np.float32)
        order = np.argsort(
            np.asarray(morton_keys(jnp.asarray(xyz), radius * 1.5)), axis=1
        )
        xyz = np.take_along_axis(xyz, order[..., None], 1)
        # evenly-spaced ranks approximate FPS coverage of the sorted cloud
        ranks = np.round(np.linspace(0, N - 1, M)).astype(np.int64)[None].repeat(B, 0)
    A = rng.normal(size=(B, N, c1)).astype(np.float32)
    cen = np.take_along_axis(xyz, ranks[..., None], 1)
    b_c = rng.normal(size=(B, M, c1)).astype(np.float32)
    block = 16
    mids = ranks.reshape(B, M // block, block)[:, :, block // 2]
    starts = np.clip(mids - W // 2, 0, N - W).astype(np.int32)
    k0 = rng.normal(size=(c1, widths[0])).astype(np.float32)  # plumbing only
    b0 = np.zeros(widths[0], np.float32)
    layer_params = [(jnp.asarray(k0), jnp.asarray(b0),
                     jnp.ones(widths[0]), jnp.zeros(widths[0]))]
    for ci, co in zip(widths[:-1], widths[1:]):
        k = rng.normal(size=(ci, co)).astype(np.float32) / np.sqrt(ci)
        layer_params.append(
            (jnp.asarray(k), jnp.asarray(rng.normal(size=co).astype(np.float32)),
             jnp.ones(co, np.float32), jnp.zeros(co, np.float32))
        )
    return (jnp.asarray(A), jnp.asarray(xyz), jnp.asarray(b_c),
            jnp.asarray(cen), jnp.asarray(starts), layer_params,
            dict(radius=radius, window=W, block=block))


def _force(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def bench_fwd(layer: str, B: int, iters: int, inner: int,
              with_winners: bool = True, scenes: bool = False) -> float:
    from eda_tpu.ops.pallas.sa_kernel import sa_pair_pool_pallas

    A, xyz, b_c, cen, starts, params, kw = make_inputs(layer, B, scenes=scenes)

    @jax.jit
    def fwd_n(A):
        def body(_, carry):
            acc, a = carry
            out = sa_pair_pool_pallas(
                a, xyz, b_c, cen, starts, params,
                with_winners=with_winners, **kw,
            )
            if with_winners:
                out = out[0]
            s = jnp.sum(out[0, 0])
            return acc + s, a + (s * 1e-24).astype(a.dtype)

        acc, _ = jax.lax.fori_loop(0, inner, body, (0.0, A))
        return acc

    _force(fwd_n(A))
    times = []
    for _ in range(max(iters // inner, 3)):
        t0 = time.perf_counter()
        _force(fwd_n(A))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / inner


def bench_bwd(layer: str, B: int, iters: int, inner: int,
              compact: bool | None = None, scenes: bool = False) -> float:
    from eda_tpu.ops.pallas.sa_kernel import (
        _ceil_lane, sa_pair_pool_bwd_pallas, sa_pair_pool_pallas,
    )

    A, xyz, b_c, cen, starts, params, kw = make_inputs(layer, B, scenes=scenes)
    out, winners = sa_pair_pool_pallas(
        A, xyz, b_c, cen, starts, params, with_winners=True, **kw
    )
    g = jnp.where(out > -1e8, 1.0, 0.0).astype(jnp.float32)
    W = kw["window"]
    if compact is None:
        compact = W % 128 == 0 and _ceil_lane(winners.shape[-1]) < W

    @jax.jit
    def bwd_n(g):
        def body(_, carry):
            acc, gg = carry
            dA, dbc, dk, db, ds, dlb = sa_pair_pool_bwd_pallas(
                A, b_c, gg, winners, starts, params,
                window=W, block=kw["block"], compact=compact,
            )
            s = jnp.sum(dbc[0, 0])
            return acc + s, gg + (s * 1e-24).astype(gg.dtype)

        acc, _ = jax.lax.fori_loop(0, inner, body, (0.0, g))
        return acc

    _force(bwd_n(g))
    times = []
    for _ in range(max(iters // inner, 3)):
        t0 = time.perf_counter()
        _force(bwd_n(g))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / inner


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layer", default="sa1", choices=sorted(LAYERS))
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--inner", type=int, default=4)
    p.add_argument("--bwd", action="store_true")
    p.add_argument("--no-winners", action="store_true")
    p.add_argument(
        "--scenes", action="store_true",
        help="use bench.py's synthetic-scene clouds + the backbone's real "
        "FPS chain instead of uniform clouds + linspace ranks",
    )
    args = p.parse_args()
    if args.bwd:
        dt = bench_bwd(args.layer, args.batch, args.iters, args.inner,
                       scenes=args.scenes)
        kind = "bwd"
    else:
        dt = bench_fwd(args.layer, args.batch, args.iters, args.inner,
                       with_winners=not args.no_winners, scenes=args.scenes)
        kind = "fwd" + ("" if not args.no_winners else "_nowin")
    print(f"{args.layer} {kind} B={args.batch}: {dt * 1e3:.2f} ms/call")
    if not args.scenes:
        print(
            "note: synthetic uniform cloud + evenly-spaced center ranks only "
            "APPROXIMATE FPS in-radius density (pass --scenes for bench.py's "
            "scene geometry); confirm A/B winners end-to-end with bench.py "
            "before changing defaults."
        )


if __name__ == "__main__":
    main()
