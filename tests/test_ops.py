"""Tests for the Pallas fused-SDF kernel (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neat_tpu.fields.mlp import ImplicitNetConfig, init_implicit_net, implicit_sdf
from neat_tpu.ops.fused_sdf import fused_sdf_eval, supports_fused_sdf


class TestFusedSdf:
    cfg = ImplicitNetConfig()

    def test_supports_guard(self):
        assert supports_fused_sdf(self.cfg)
        assert not supports_fused_sdf(ImplicitNetConfig(dims=(64,) * 4))
        assert not supports_fused_sdf(ImplicitNetConfig(skip_in=()))

    @pytest.mark.slow  # pallas interpret-mode execute; ~5 s
    def test_matches_reference_bf16(self, rng):
        params = init_implicit_net(jax.random.PRNGKey(0), self.cfg)
        pts = jnp.asarray(rng.randn(300, 3).astype(np.float32))
        ref = np.asarray(
            implicit_sdf(params, pts, self.cfg, compute_dtype=jnp.bfloat16)
        )[:, 0]
        fused = np.asarray(fused_sdf_eval(params, pts, self.cfg, interpret=True))
        assert fused.shape == (300,)
        np.testing.assert_allclose(fused, ref, atol=2e-2, rtol=2e-2)

    def test_matches_reference_f32_loosely(self, rng):
        params = init_implicit_net(jax.random.PRNGKey(1), self.cfg)
        pts = jnp.asarray(rng.rand(64, 3).astype(np.float32) * 2 - 1)
        ref = np.asarray(implicit_sdf(params, pts, self.cfg))[:, 0]
        fused = np.asarray(fused_sdf_eval(params, pts, self.cfg, interpret=True))
        # bf16 matmuls: relative error ~1e-2 on unit-scale sdf values
        np.testing.assert_allclose(fused, ref, atol=3e-2, rtol=3e-2)

    def test_clamp_applied(self, rng):
        params = init_implicit_net(jax.random.PRNGKey(0), self.cfg)
        far = jnp.asarray([[2.9, 0.0, 0.0]] * 4)
        fused = np.asarray(fused_sdf_eval(params, far, self.cfg, interpret=True))
        clamp = self.cfg.sphere_scale * (self.cfg.sdf_bounding_sphere - 2.9)
        assert (fused <= clamp + 1e-4).all()


class TestFusedField:
    """Fused main-pass kernel (ops/fused_field.py) vs the XLA path, in
    interpret mode on CPU. The f32 kernel must agree to float tolerance in
    BOTH the forward outputs and the full parameter/input gradients
    (including the second-order terms through the inner SDF gradient)."""

    icfg = ImplicitNetConfig()
    from neat_tpu.fields.mlp import RenderNetConfig as _R

    rcfg = _R(multires_view=4)
    acfg = _R(d_out=6, multires_view=0)

    def _params(self):
        from neat_tpu.fields.mlp import init_render_net, init_attraction_net

        k = jax.random.PRNGKey(0)
        return {
            "implicit": init_implicit_net(jax.random.fold_in(k, 1), self.icfg),
            "rendering": init_render_net(jax.random.fold_in(k, 2), self.rcfg),
            "attraction": init_attraction_net(jax.random.fold_in(k, 3), self.acfg),
        }

    def _inputs(self, n=300):
        k = jax.random.PRNGKey(7)
        x = jax.random.uniform(jax.random.fold_in(k, 1), (n, 3), minval=-1, maxval=1)
        d = jax.random.normal(jax.random.fold_in(k, 2), (n, 3))
        return x, d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def test_supports_guard(self):
        from neat_tpu.ops.fused_field import supports_fused_field

        assert supports_fused_field(self.icfg, self.rcfg, self.acfg)
        assert not supports_fused_field(
            ImplicitNetConfig(dims=(64,) * 4), self.rcfg, self.acfg
        )
        assert not supports_fused_field(
            self.icfg, self._R(multires_view=4, mode="nerf"), self.acfg
        )

    @pytest.mark.slow  # full-size nested-vjp graphs: slow CPU compile
    def test_forward_and_grads_match_xla(self):
        from neat_tpu.fields.mlp import (
            implicit_sdf_feat_grad,
            render_forward,
            attraction_forward,
        )
        from neat_tpu.ops.fused_field import fused_field_eval

        params = self._params()
        x, d = self._inputs()

        sdf_r, feats_r, grads_r = implicit_sdf_feat_grad(
            params["implicit"], x, self.icfg
        )
        rgb_r = render_forward(params["rendering"], x, grads_r, d, feats_r, self.rcfg)
        att_r = attraction_forward(
            params["attraction"], x, grads_r, d, feats_r, self.acfg
        )
        sdf_k, grads_k, rgb_k, lines_k = fused_field_eval(
            params, x, d, self.icfg, self.rcfg, compute_dtype="float32",
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(sdf_k), np.asarray(sdf_r), atol=2e-5)
        np.testing.assert_allclose(np.asarray(grads_k), np.asarray(grads_r), atol=2e-4)
        np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r), atol=2e-5)
        np.testing.assert_allclose(np.asarray(lines_k), np.asarray(att_r), atol=2e-4)

        def loss_xla(params):
            sdf, feats, grads = implicit_sdf_feat_grad(params["implicit"], x, self.icfg)
            rgb = render_forward(params["rendering"], x, grads, d, feats, self.rcfg)
            att = attraction_forward(params["attraction"], x, grads, d, feats, self.acfg)
            return (
                jnp.mean(sdf**2)
                + jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
                + jnp.mean(rgb)
                + jnp.mean(jnp.abs(att))
            )

        def loss_fused(params):
            sdf, grads, rgb, lines = fused_field_eval(
                params, x, d, self.icfg, self.rcfg, compute_dtype="float32",
                interpret=True,
            )
            return (
                jnp.mean(sdf**2)
                + jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
                + jnp.mean(rgb)
                + jnp.mean(jnp.abs(lines))
            )

        gx = jax.grad(loss_xla)(params)
        gf = jax.grad(loss_fused)(params)
        for px, pf in zip(
            jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gf)
        ):
            scale = np.abs(np.asarray(px)).max() + 1e-8
            err = np.abs(np.asarray(px) - np.asarray(pf)).max() / scale
            assert err < 1e-3, err


class TestStashedBackward:
    """Hand-derived stashed-residual fwd/bwd (ops/fused_field_stash.py) vs
    jax.vjp of the traced kernel math (_field_math), in f32 — forward
    outputs AND the full (weights, x, d) cotangent application must agree,
    including the second-order terms through the inner spatial gradient
    and the sphere-clamp branches."""

    icfg = ImplicitNetConfig()
    from neat_tpu.fields.mlp import RenderNetConfig as _R

    rcfg = _R(multires_view=4)
    acfg = _R(d_out=6, multires_view=0)

    def _setup(self, n=257):
        from neat_tpu.fields.mlp import (
            init_attraction_net,
            init_render_net,
        )
        from neat_tpu.ops.fused_field import _flatten_eff

        k = jax.random.PRNGKey(3)
        params = {
            "implicit": init_implicit_net(jax.random.fold_in(k, 1), self.icfg),
            "rendering": init_render_net(jax.random.fold_in(k, 2), self.rcfg),
            "attraction": init_attraction_net(jax.random.fold_in(k, 3), self.acfg),
        }
        flat_eff = _flatten_eff(params)
        x = jax.random.uniform(
            jax.random.fold_in(k, 4), (n, 3), minval=-1.2, maxval=1.2
        )
        # push some points near/past the bounding sphere so the clamp's
        # sphere branch (m_sph) is exercised in both fwd and bwd
        far = x[: n // 4] * (3.2 / jnp.linalg.norm(x[: n // 4], axis=-1, keepdims=True))
        x = jnp.concatenate([far, x[n // 4 :]], axis=0)
        d = jax.random.normal(jax.random.fold_in(k, 5), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        cots = (
            jax.random.normal(jax.random.fold_in(k, 6), (n, 1)),
            jax.random.normal(jax.random.fold_in(k, 7), (n, 3)),
            jax.random.normal(jax.random.fold_in(k, 8), (n, 3)),
            jax.random.normal(jax.random.fold_in(k, 9), (n, 6)),
        )
        return flat_eff, x, d, cots

    @pytest.mark.slow  # full-size nested-vjp reference graph: slow CPU compile
    def test_fwd_and_bwd_match_traced_vjp(self):
        from neat_tpu.ops.fused_field import _field_math
        from neat_tpu.ops.fused_field_stash import (
            field_bwd_stashed,
            field_fwd_res,
        )

        flat_eff, x, d, cots = self._setup()
        cd = jnp.float32

        ref_out, ref_vjp = jax.vjp(
            lambda e, xx, dd: _field_math(e, xx, dd, self.icfg, self.rcfg, cd),
            flat_eff, x, d,
        )
        out, res = field_fwd_res(flat_eff, x, d, self.icfg, self.rcfg, cd)
        for a, b, name in zip(out, ref_out, ("sdf", "grads", "rgb", "att")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, err_msg=name
            )
        # clamp really active somewhere
        sdf, grads = out[0], out[1]
        assert bool(jnp.any(jnp.linalg.norm(x, axis=-1) > 3.0))

        # the traced-vjp gradients: loose tolerance — _field_math hard-casts
        # grads/feats to f32 internally, so even exact adjoints differ by
        # f32 noise through the 5-layer heads (same 1e-3 bound the fused
        # kernel test uses)
        ref_deff, ref_dx, ref_dd = ref_vjp(tuple(cots))
        deff, dx, dd = field_bwd_stashed(
            flat_eff, x, d, res, cots, self.icfg, self.rcfg, cd
        )
        np.testing.assert_allclose(
            np.asarray(dx), np.asarray(ref_dx), rtol=1e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(dd), np.asarray(ref_dd), rtol=1e-3, atol=2e-4
        )
        assert len(deff) == len(ref_deff)
        # 5e-3: two algebraically-equivalent f32 computations of a
        # second-order quantity differ by amplified rounding (the f64
        # adjoint test below is the exact correctness gate at 1e-11)
        for i, (a, b) in enumerate(zip(deff, ref_deff)):
            scale = np.abs(np.asarray(b)).max() + 1e-8
            err = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
            assert err < 5e-3, (i, err)

    @pytest.mark.slow
    def test_bwd_is_exact_adjoint_in_f64(self):
        """The hand-written backward must be the EXACT adjoint of the
        hand-written forward: compare against jax.vjp of field_fwd_res
        itself in float64 — any structural error (wrong mask, missing
        curvature term, mis-split skip) shows up at 1e-12, not under
        float noise."""
        from neat_tpu.ops.fused_field_stash import (
            field_bwd_stashed,
            field_fwd_res,
        )

        with jax.enable_x64(True):
            flat_eff, x, d, cots = self._setup(n=65)
            to64 = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), t
            )
            flat_eff, x, d, cots = (
                to64(flat_eff), to64(x), to64(d), to64(cots)
            )
            cd = jnp.float64

            ref_out, ref_vjp = jax.vjp(
                lambda e, xx, dd: field_fwd_res(
                    e, xx, dd, self.icfg, self.rcfg, cd
                )[0],
                flat_eff, x, d,
            )
            out, res = field_fwd_res(flat_eff, x, d, self.icfg, self.rcfg, cd)
            for a, b in zip(out, ref_out):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b))
            ref_deff, ref_dx, ref_dd = ref_vjp(tuple(cots))
            deff, dx, dd = field_bwd_stashed(
                flat_eff, x, d, res, cots, self.icfg, self.rcfg, cd
            )
            np.testing.assert_allclose(
                np.asarray(dx), np.asarray(ref_dx), rtol=1e-11, atol=1e-11
            )
            np.testing.assert_allclose(
                np.asarray(dd), np.asarray(ref_dd), rtol=1e-11, atol=1e-11
            )
            for i, (a, b) in enumerate(zip(deff, ref_deff)):
                scale = np.abs(np.asarray(b)).max() + 1e-12
                err = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
                assert err < 1e-11, (i, err)


class TestStashClampTie:
    """At an EXACT sdf_raw == sphere clamp tie, the hand-written forward
    must follow jax.vjp's balanced-eq convention: the spatial gradient is
    0.5*grad(mlp) + 0.5*grad(sphere). The ones-seeded sweep applies the
    min-clamp multiplier once; a m_raw-seeded sweep would square it
    (0.25 on the mlp branch) — a regression invisible to the random-point
    parity tests (ties are measure-zero) and to the f64 exact-adjoint
    test (which compares the backward against the forward's OWN vjp)."""

    @pytest.mark.slow
    def test_tie_matches_balanced_eq(self):
        import dataclasses

        from neat_tpu.ops.fused_field import N_IMPLICIT_LAYERS, _flatten_eff
        from neat_tpu.ops.fused_field_stash import field_fwd_res
        from neat_tpu.fields.mlp import (
            RenderNetConfig,
            init_attraction_net,
            init_implicit_net,
            init_render_net,
        )

        rcfg = RenderNetConfig(multires_view=4)
        acfg = RenderNetConfig(d_out=6, multires_view=0)
        with jax.enable_x64(True):
            icfg = ImplicitNetConfig()
            k = jax.random.PRNGKey(11)
            params = {
                "implicit": init_implicit_net(jax.random.fold_in(k, 1), icfg),
                "rendering": init_render_net(jax.random.fold_in(k, 2), rcfg),
                "attraction": init_attraction_net(jax.random.fold_in(k, 3), acfg),
            }
            to64 = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), t
            )
            params = to64(params)
            x = jnp.asarray([[0.5, 0.25, -0.125]], jnp.float64)  # exact norm ops
            d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
            flat_eff = _flatten_eff(params)
            cd = jnp.float64

            nosphere = dataclasses.replace(icfg, sdf_bounding_sphere=0.0)

            # drive the final-layer bias until the STASH forward's own
            # sdf_raw == sphere bitwise (sdf_raw is affine in the bias, so
            # a couple of corrections converge); pinning against another
            # implementation is impossible — algebraically-equivalent
            # forwards differ in the last bits
            def sdf_raw_of(fe):
                return float(
                    field_fwd_res(fe, x, d, nosphere, rcfg, cd)[0][0][0, 0]
                )

            sphere_val = float(
                icfg.sphere_scale
                * (icfg.sdf_bounding_sphere - jnp.linalg.norm(x[0]))
            )
            last_b = 2 * (N_IMPLICIT_LAYERS - 1) + 1  # final implicit bias slot
            fe = list(flat_eff)
            for _ in range(8):
                gap = sphere_val - sdf_raw_of(tuple(fe))
                if gap == 0.0:
                    break
                fe[last_b] = fe[last_b].at[0, 0].add(gap)
            fe = tuple(fe)
            assert sdf_raw_of(fe) == sphere_val, "could not pin an exact tie"

            # analytic balanced-eq expectation at the tie:
            #   grads == 0.5 * grad(sdf_raw) + 0.5 * grad(sphere)
            # with grad(sdf_raw) = the clamp-free stash gradient and
            # grad(sphere) = -scale * x/|x| in closed form
            (_, g_mlp, _, _), _ = field_fwd_res(fe, x, d, nosphere, rcfg, cd)
            g_sphere = -icfg.sphere_scale * np.asarray(x) / float(
                jnp.linalg.norm(x[0])
            )
            out, _ = field_fwd_res(fe, x, d, icfg, rcfg, cd)
            sdf, grads = out[0], out[1]
            assert float(sdf[0, 0]) == sphere_val
            np.testing.assert_allclose(
                np.asarray(grads),
                0.5 * np.asarray(g_mlp) + 0.5 * g_sphere,
                rtol=1e-11, atol=1e-11,
            )
            # sanity that the convention matches jax's minimum at a tie:
            # _balanced is jax's _balanced_eq (0.5 at equality)
            from neat_tpu.ops.fused_field_stash import _balanced

            half = _balanced(jnp.float64(1.0), jnp.float64(1.0))
            assert float(half) == 0.5


class TestStashPrimalDispatch:
    """The custom-vjp op's undifferentiated primal dispatches to the
    stash-free forward kernel (non-grad forwards must not stream
    residuals to HBM); its outputs must agree with the fwd-rule path that
    the differentiated call takes."""

    @pytest.mark.slow
    def test_primal_matches_fwd_rule(self):
        from neat_tpu.fields.mlp import (
            RenderNetConfig,
            init_attraction_net,
            init_implicit_net,
            init_render_net,
        )
        from neat_tpu.ops.fused_field_stash import fused_field_eval_stash

        icfg = ImplicitNetConfig()
        rcfg = RenderNetConfig(multires_view=4)
        acfg = RenderNetConfig(d_out=6, multires_view=0)
        k = jax.random.PRNGKey(7)
        params = {
            "implicit": init_implicit_net(jax.random.fold_in(k, 1), icfg),
            "rendering": init_render_net(jax.random.fold_in(k, 2), rcfg),
            "attraction": init_attraction_net(jax.random.fold_in(k, 3), acfg),
        }
        x = jax.random.uniform(jax.random.fold_in(k, 4), (130, 3), minval=-1, maxval=1)
        d = jax.random.normal(jax.random.fold_in(k, 5), (130, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        def run(pts):
            return fused_field_eval_stash(
                params, pts, d, icfg, rcfg, compute_dtype="float32",
                interpret=True,
            )

        primal = run(x)  # undifferentiated: stash-free kernel
        # differentiated: custom_vjp fwd rule (stashing kernel)
        fwd_rule, _ = jax.vjp(lambda pts: run(pts)[0], x)
        np.testing.assert_allclose(
            np.asarray(fwd_rule), np.asarray(primal[0]), rtol=1e-5, atol=1e-6
        )
        for a in primal:
            assert np.all(np.isfinite(np.asarray(a)))


class TestStashedFieldEval:
    """fused_field_eval_stash (the custom-vjp op wired for the pallas
    stash kernels) vs the XLA path, interpret mode, f32 — same contract
    as TestFusedFieldKernel for the recompute-backward op."""

    @pytest.mark.slow
    def test_grads_match_xla(self):
        from neat_tpu.fields.mlp import (
            attraction_forward,
            implicit_sdf_feat_grad,
            render_forward,
        )
        from neat_tpu.ops.fused_field_stash import fused_field_eval_stash

        t = TestFusedField()
        params = t._params()
        x, d = t._inputs(n=300)

        def loss_xla(params):
            sdf, feats, grads = implicit_sdf_feat_grad(params["implicit"], x, t.icfg)
            rgb = render_forward(params["rendering"], x, grads, d, feats, t.rcfg)
            att = attraction_forward(params["attraction"], x, grads, d, feats, t.acfg)
            return (
                jnp.mean(sdf**2)
                + jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
                + jnp.mean(rgb)
                + jnp.mean(jnp.abs(att))
            )

        def loss_stash(params):
            sdf, grads, rgb, lines = fused_field_eval_stash(
                params, x, d, t.icfg, t.rcfg, compute_dtype="float32",
                interpret=True,
            )
            return (
                jnp.mean(sdf**2)
                + jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
                + jnp.mean(rgb)
                + jnp.mean(jnp.abs(lines))
            )

        vx, gx = jax.value_and_grad(loss_xla)(params)
        vf, gf = jax.value_and_grad(loss_stash)(params)
        np.testing.assert_allclose(float(vx), float(vf), rtol=1e-5)
        for px, pf in zip(
            jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gf)
        ):
            scale = np.abs(np.asarray(px)).max() + 1e-8
            err = np.abs(np.asarray(px) - np.asarray(pf)).max() / scale
            assert err < 1e-3, err


class TestFusedSamplerRound:
    """ops/fused_round.py (one-kernel refinement round) vs the XLA round
    math in sampling/samplers.py, interpret mode on CPU, f32."""

    def _round_xla(self, z, sdf, beta, beta0, eps, beta_iters, add_tiny, refine):
        """The exact per-round block of error_bound_z_vals (bisect path)."""
        from neat_tpu.core.density import LaplaceDensityParams, laplace_density
        from neat_tpu.core.render import alpha_transmittance
        from neat_tpu.sampling.samplers import _d_star, _error_bound

        # _error_bound/laplace_density take beta explicitly; params unused
        params = LaplaceDensityParams.init(1.0)
        beta_min = 0.0
        dists = z[..., 1:] - z[..., :-1]
        d_star = _d_star(z, sdf)
        curr = _error_bound(beta0, params, beta_min, sdf, dists, d_star)
        beta = jnp.where(curr <= eps, beta0, beta)
        beta_lo = jnp.full(z.shape[:1], beta0)
        beta_hi = beta
        for _ in range(beta_iters):
            mid = 0.5 * (beta_lo + beta_hi)
            err = _error_bound(mid[:, None], params, beta_min, sdf, dists, d_star)
            ok = err <= eps
            beta_hi = jnp.where(ok, mid, beta_hi)
            beta_lo = jnp.where(ok, beta_lo, mid)
        beta = beta_hi
        density = laplace_density(sdf, params, beta_min=beta_min, beta=beta[:, None])
        alpha, transmittance, _ = alpha_transmittance(z, density)
        weights = alpha * transmittance
        pdf = None
        if refine:
            err_sec = (
                jnp.exp(-d_star / beta[:, None]) * dists**2 / (4.0 * beta[:, None] ** 2)
            )
            err_int = jnp.cumsum(err_sec, axis=-1)
            bound_opacity = (
                jnp.clip(jnp.exp(err_int), max=1e6) - 1.0
            ) * transmittance[..., :-1]
            pdf = bound_opacity + add_tiny
            pdf = pdf / jnp.sum(pdf, axis=-1, keepdims=True)
        return beta, weights, pdf

    def _data(self, r=128, s=256, seed=0):
        rng = np.random.RandomState(seed)
        z = np.sort(rng.uniform(0.0, 6.0, size=(r, s)).astype(np.float32), axis=1)
        # SDF of rays crossing a unit sphere-ish surface: smooth, sign changes
        sdf = (np.abs(z - 3.0) - 1.5 + 0.3 * rng.randn(r, s)).astype(np.float32)
        beta = rng.uniform(0.05, 0.5, size=(r,)).astype(np.float32)
        return jnp.asarray(z), jnp.asarray(sdf), jnp.asarray(beta)

    @pytest.mark.slow  # pallas interpret-mode execute; ~7 s across params
    @pytest.mark.parametrize("refine", [True, False])
    def test_matches_xla_round(self, refine):
        from neat_tpu.ops.fused_round import fused_sampler_round

        z, sdf, beta = self._data()
        beta0 = jnp.asarray(2e-3 + 1e-4, jnp.float32)
        eps, iters, tiny = 0.1, 10, 0.0
        bx, wx, px = self._round_xla(z, sdf, beta, beta0, eps, iters, tiny, refine)
        bf, wf, pf = fused_sampler_round(
            z, sdf, beta, beta0, eps=eps, beta_iters=iters, add_tiny=tiny,
            refine=refine, interpret=True,
        )
        # bisection betas: identical branch decisions except within ~ulp of
        # the err<=eps knife edge; compare to float tolerance
        np.testing.assert_allclose(np.asarray(bf), np.asarray(bx), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(wf), np.asarray(wx), rtol=2e-4, atol=2e-5)
        if refine:
            np.testing.assert_allclose(
                np.asarray(pf[:, :-1]), np.asarray(px), rtol=2e-4, atol=2e-5
            )
            assert np.all(np.asarray(pf[:, -1]) == 0.0)

    @pytest.mark.slow
    def test_sampler_end_to_end_fused(self):
        """error_bound_z_vals with fused_rounds='interpret' vs 'off' on the
        sphere scene: same sample distribution."""
        import dataclasses

        from neat_tpu.core.density import LaplaceDensityParams
        from neat_tpu.sampling import ErrorBoundSamplerConfig, error_bound_z_vals

        def sphere_sdf(pts):
            return jnp.linalg.norm(pts, axis=-1) - 1.0

        base = ErrorBoundSamplerConfig(
            scene_bounding_sphere=3.0, near=0.0, n_samples=16,
            n_samples_eval=128, n_samples_extra=8, eps=0.1, beta_iters=10,
            max_total_iters=3,
        )
        density = LaplaceDensityParams.init(0.1)
        n = 128
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        loc = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))

        def run(cfg):
            z, ze = error_bound_z_vals(
                jax.random.PRNGKey(0), dirs, loc, sphere_sdf, density, cfg,
                training=False,
            )
            return np.asarray(z)

        z_x = run(base)
        z_f = run(dataclasses.replace(base, fused_rounds="interpret"))
        diff = np.abs(z_x - z_f)
        assert np.median(diff) < 1e-4, np.median(diff)
        assert diff.mean() < 0.02, diff.mean()


class TestShardMapVma:
    """The pallas kernels must type-check under jax.shard_map's vma
    (varying-mesh-axes) tracking, which is how a TPU pod step wraps them
    (GSPMD cannot partition an opaque pallas_call, so the pod path uses
    shard_map; jax's check_vma then requires out_shapes to declare which
    mesh axes each output varies over — ops/_vma.py).

    These tests trace only (jax.eval_shape): the vma check runs at trace
    time on every backend, which is exactly what a real pod hits; the hlo
    interpreter's re-evaluation of kernel bodies under shard_map drops vma
    from ref reads (upstream jax bug), so interpret-mode *execution* under
    shard_map is not exercised."""

    def _mesh(self):
        from neat_tpu.parallel.mesh import make_mesh

        return make_mesh(8)

    def test_fused_round_traces_under_shard_map(self):
        from jax.sharding import PartitionSpec as P

        from neat_tpu.ops.fused_round import fused_sampler_round

        mesh = self._mesh()
        R, S = 1024, 128
        z = jnp.zeros((R, S))
        sdf = jnp.zeros((R, S))
        beta = jnp.zeros((R,))
        beta0 = jnp.asarray(0.11)

        def body(z, sdf, beta):
            return fused_sampler_round(
                z, sdf, beta, beta0, eps=0.1, beta_iters=10,
                add_tiny=1e-6, refine=True,
            )

        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data")),
        )
        outs = jax.eval_shape(f, z, sdf, beta)
        assert outs[0].shape == (R,) and outs[1].shape == (R, S)

    def test_fused_sdf_traces_under_shard_map(self):
        from jax.sharding import PartitionSpec as P

        from neat_tpu.ops.fused_sdf import fused_sdf_eval

        mesh = self._mesh()
        cfg = ImplicitNetConfig()
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        pts = jnp.zeros((1024, 3))

        def body(params, pts):
            return fused_sdf_eval(params, pts, cfg)

        f = jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data")
        )
        out = jax.eval_shape(f, params, pts)
        assert out.shape == (1024,)

    @pytest.mark.parametrize("which", ["recompute", "stash"])
    def test_fused_field_grad_traces_under_shard_map(self, which):
        from jax.sharding import PartitionSpec as P

        from neat_tpu.ops.fused_field import fused_field_eval
        from neat_tpu.ops.fused_field_stash import fused_field_eval_stash

        eval_fn = fused_field_eval if which == "recompute" else fused_field_eval_stash
        t = TestFusedField()
        params = t._params()
        mesh = self._mesh()
        x = jnp.zeros((1024, 3))
        d = jnp.zeros((1024, 3))

        def body(params, x, d):
            def loss(params):
                sdf, grads, rgb, lines = eval_fn(
                    params, x, d, t.icfg, t.rcfg, compute_dtype="bfloat16"
                )
                return (
                    jnp.mean(sdf**2)
                    + jnp.mean(grads**2)
                    + jnp.mean(rgb)
                    + jnp.mean(jnp.abs(lines))
                )

            # per-shard partial param grads -> psum, as a pod step would
            g = jax.grad(loss)(params)
            return jax.lax.psum(g, "data")

        f = jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P("data"), P("data")), out_specs=P()
        )
        g = jax.eval_shape(f, params, x, d)
        leaves = jax.tree_util.tree_leaves(g)
        assert leaves and all(l.shape is not None for l in leaves)
