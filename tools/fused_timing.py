"""Time the fused field kernel's forward and backward against the XLA path
at the main-pass point count (1024 rays x 98 samples), on the current
backend.

Separates:
  * XLA path:   forward, and forward+backward (jax.grad of a scalarized
                composition) — the 19.3 ms round-2 reference point,
  * fused path: forward kernel alone, and forward+backward.

This tells whether the fused backward is compute- or bandwidth-bound and
how much its in-kernel recompute actually costs — the decision input for
a stashed-residual backward (VERDICT round-2 #4).

Usage: python tools/fused_timing.py [--platform cpu|axon] [--points 100352]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    ap.add_argument("--points", type=int, default=1024 * 98)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from neat_tpu.fields.mlp import (
        ImplicitNetConfig,
        RenderNetConfig,
        attraction_forward,
        implicit_sdf_feat_grad,
        init_attraction_net,
        init_implicit_net,
        init_render_net,
        render_forward,
    )
    from neat_tpu.ops.fused_field import fused_field_eval

    icfg = ImplicitNetConfig()
    rcfg = RenderNetConfig(multires_view=4)
    acfg = RenderNetConfig(d_out=6, multires_view=0)
    k = jax.random.PRNGKey(0)
    params = {
        "implicit": init_implicit_net(jax.random.fold_in(k, 1), icfg),
        "rendering": init_render_net(jax.random.fold_in(k, 2), rcfg),
        "attraction": init_attraction_net(jax.random.fold_in(k, 3), acfg),
    }
    n = args.points
    x = jax.random.uniform(jax.random.fold_in(k, 4), (n, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.fold_in(k, 5), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    fdtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    def xla_outputs(params):
        sdf, feats, grads = implicit_sdf_feat_grad(
            params["implicit"], x, icfg, compute_dtype=fdtype
        )
        rgb = render_forward(
            params["rendering"], x, grads, d, feats, rcfg, compute_dtype=fdtype
        )
        att = attraction_forward(
            params["attraction"], x, grads, d, feats, acfg, compute_dtype=fdtype
        )
        return sdf, grads, rgb, att

    def fused_outputs(params):
        sdf, grads, rgb, lines = fused_field_eval(
            params, x, d, icfg, rcfg, compute_dtype=args.dtype
        )
        return sdf, grads, rgb, lines

    def scalarize(outs):
        # weight every output so all cotangent paths are live (incl. the
        # second-order path through grads)
        sdf, grads, rgb, att = outs
        return (
            jnp.sum(sdf**2)
            + jnp.sum((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
            + jnp.sum(rgb)
            + jnp.sum(jnp.abs(att))
        )

    from neat_tpu.ops.fused_field_stash import fused_field_eval_stash

    def stash_outputs(params):
        sdf, grads, rgb, lines = fused_field_eval_stash(
            params, x, d, icfg, rcfg, compute_dtype=args.dtype
        )
        return sdf, grads, rgb, lines

    fns = {
        "xla_fwd": jax.jit(lambda p: scalarize(xla_outputs(p))),
        "xla_grad": jax.jit(jax.grad(lambda p: scalarize(xla_outputs(p)))),
        "fused_fwd": jax.jit(lambda p: scalarize(fused_outputs(p))),
        "fused_grad": jax.jit(jax.grad(lambda p: scalarize(fused_outputs(p)))),
        "stash_fwd": jax.jit(lambda p: scalarize(stash_outputs(p))),
        "stash_grad": jax.jit(jax.grad(lambda p: scalarize(stash_outputs(p)))),
    }

    def fetch(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(np.asarray(leaf).ravel()[0])

    result = {"platform": jax.devices()[0].platform, "dtype": args.dtype,
              "points": n}
    for name, fn in fns.items():
        try:
            out = fn(params)
            fetch(out)
            out = fn(params)
            fetch(out)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fn(params)
            fetch(out)
            result[name + "_ms"] = round(
                (time.perf_counter() - t0) / args.steps * 1e3, 2
            )
        except Exception as e:  # fused path may be unsupported off-TPU
            result[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
