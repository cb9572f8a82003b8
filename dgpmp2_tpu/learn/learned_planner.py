"""Learned differentiable planner: CNN + head predicting factor covariances.

The learned-planning composition of the reference
(``DiffGPMP2Planner.step`` with ``learn_params``,
``diff_gpmp2/gpmp2/diff_gpmp2_planner.py:176-211``): per GN iteration a CNN
encodes the ``(im, sdf)`` stack, a feed-forward or recurrent head maps
(features ⊕ trajectory positions) to a flat vector, and
:mod:`dgpmp2_tpu.learn.covariances` decodes it into PSD factor covariances
that drive the block GN step.  Gradients flow through the GN solve into the
network (implicit-adjoint VJP of the block-tridiagonal solve).

All state is explicit: flax variables (params + batch_stats), optional RNN
hidden carry, and the fixed external covariances used for ``err_ext``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.learn import covariances as cov_lib
from dgpmp2_tpu.models.conv_encoder import ConvEncoder, ConvEncoder3D
from dgpmp2_tpu.models.cov_head import FeedForwardHead, RecurrentHead, traj_positions_flat


@dataclasses.dataclass(frozen=True)
class LearnedPlannerConfig:
    """Static learned-planner options (learn-YAML ``dgpmp2``/``model``
    sections, SURVEY.md §5.6)."""

    dynamics_mode: str = "diag_identity"
    learn_eps: bool = False
    # Bound on the learned safety margin: eps = eps_max * sigmoid(s)
    # instead of the unbounded s**2 (covariances.decode).  None keeps the
    # reference-faithful unbounded decode.
    eps_max: Optional[float] = None
    sdf_predict: bool = True  # feed (im, sdf) vs im only
    # Feed the hinge costmap max(0, (eps + r) - sdf) as the SDF channel —
    # the reference's ``costmap_predict`` learn flag (read at
    # ``learn_module_fcn.py:25``, intent per its costmap_2d input path;
    # ``safety_dist = epsilon_dist + robot_radius``, learn_module_fcn.py:22).
    costmap_predict: bool = False
    costmap_eps: float = 0.4  # epsilon_dist used for the costmap channel
    # Per-image [-1, 1] min-max normalization of the conv input — the
    # reference's conv preprocessing (``learn_module_conv.py:91-96``).
    # Off by default: the rebuild's campaigns were trained on raw
    # (binary im, metric sdf) channels and flipping this invalidates
    # their saved weights.
    normalize_im: bool = False
    fixed_conv: bool = False  # conv features computed once per problem
    dtheta_predict: bool = False  # feed previous GN update to the head
    # (``dtheta_predict``, diff_gpmp2_planner.py:57,198)
    # Initialize the head output so decoded covariances start at these
    # static scalars (sqrt of the weights; see static_out_bias).  None keeps
    # the reference's zero-ish init.
    static_init: Optional[tuple] = None  # (qc_inv_scalar, cost_sigma[, eps])
    model_type: str = "feed_forward"  # feed_forward | rnn_gru | rnn_lstm
    hidden_dim: int = 64
    num_hidden: int = 1
    dropout_prob: float = 0.5
    dtype: Any = jnp.float32


class LearnedDiffGPMP2Planner:
    """Bundles ConvEncoder + covariance head + the block GN engine."""

    def __init__(
        self,
        spec: graph.GraphSpec,
        robot,
        optim_cfg: gn.OptimConfig,
        learn_cfg: LearnedPlannerConfig,
    ):
        self.spec = spec
        self.robot = robot
        self.cfg = optim_cfg
        self.learn_cfg = learn_cfg
        self.out_dim = cov_lib.out_dim(spec, learn_cfg.dynamics_mode,
                                       learn_cfg.learn_eps)
        # 3-D workspaces (spec.z_lims set) encode voxel stacks with the
        # rank-3 twin of the reference CNN; the head consumes xyz instead
        # of xy positions.  Everything downstream is dimension-blind.
        self._is3d = spec.z_lims is not None
        self.conv = (ConvEncoder3D(dtype=learn_cfg.dtype) if self._is3d
                     else ConvEncoder(dtype=learn_cfg.dtype))
        out_bias = None
        if learn_cfg.static_init is not None:
            out_bias = self.static_out_bias(*learn_cfg.static_init)
        if learn_cfg.model_type == "feed_forward":
            self.head = FeedForwardHead(
                out_dim=self.out_dim, dropout_prob=learn_cfg.dropout_prob,
                dtype=learn_cfg.dtype, out_bias=out_bias,
            )
        else:
            self.head = RecurrentHead(
                out_dim=self.out_dim,
                hidden_dim=learn_cfg.hidden_dim,
                num_hidden=learn_cfg.num_hidden,
                cell_type="lstm" if learn_cfg.model_type == "rnn_lstm" else "gru",
                dtype=learn_cfg.dtype,
                out_bias=out_bias,
            )

    @property
    def recurrent(self) -> bool:
        return self.learn_cfg.model_type != "feed_forward"

    def static_out_bias(self, qc_inv_scalar, cost_sigma, eps=0.4):
        """Head-output bias reproducing the static covariances at init.

        The decode squares outputs (``covariances.decode``), so emitting
        sqrt(Q_c⁻¹ scalar) for the GP terms and 1/σ for the obstacle terms
        makes the zero-features forward pass equal the fixed-covariance
        planner.  Only the elementwise-squared modes can represent the
        static diagonal exactly: ``qc_full``/``q_full`` decode via rank-1
        outer products ``s sᵀ``, for which a constant bias yields the
        singular all-ones matrix ``qc_inv·𝟙`` — NOT ``qc_inv·I`` — so
        static_init is rejected there.  (For ``nlinks > 1`` the obstacle
        block has the same rank-1 limitation; the bias then yields
        ``(1/σ²)·𝟙`` over links, an approximate init, documented rather
        than rejected because per-link coupling at init is benign for the
        hinge costs.)
        """
        import math

        spec, cfg = self.spec, self.learn_cfg
        t, tn, l = spec.num_gp_factors, spec.num_traj_states, spec.nlinks
        mode = cfg.dynamics_mode
        if mode in ("qc_full", "q_full"):
            raise ValueError(
                f"static_init is not representable under dynamics_mode "
                f"{mode!r}: the rank-1 outer-product decode cannot emit the "
                "static diagonal covariance (a constant bias decodes to the "
                "singular qc_inv*ones matrix). Use diag/diag_identity for "
                "static_init, or initialize without it."
            )
        gp_val = math.sqrt(float(qc_inv_scalar))
        obs_val = 1.0 / float(cost_sigma)
        gp_terms = {"fix_dynamics": 0, "diag_identity": t,
                    "diag": t * spec.dof}[mode]
        bias = [gp_val] * gp_terms + [obs_val] * (tn * l)
        if cfg.learn_eps:
            if cfg.eps_max is not None:
                # sigmoid decode: bias = logit(eps0 / eps_max) so the init
                # forward pass still decodes exactly eps0.
                p = float(eps) / float(cfg.eps_max)
                if not 0.0 < p < 1.0:
                    raise ValueError(
                        f"static_init eps {eps} must lie strictly inside "
                        f"(0, eps_max={cfg.eps_max}) for the sigmoid decode "
                        "to reproduce it at init"
                    )
                eps_bias = math.log(p / (1.0 - p))
            else:
                eps_bias = math.sqrt(float(eps))
            bias += [eps_bias] * (tn * l)
        return tuple(bias)

    # -- variable init -----------------------------------------------------

    def _head_pos(self, th, dth_prev=None):
        pd = 3 if self._is3d else 2
        pos = traj_positions_flat(th, pd).astype(self.learn_cfg.dtype)
        if self.learn_cfg.dtheta_predict:
            if dth_prev is None:
                dth_prev = jnp.zeros_like(th)
            pos = jnp.concatenate(
                [pos,
                 traj_positions_flat(dth_prev, pd).astype(self.learn_cfg.dtype)],
                axis=-1,
            )
        return pos

    def init_variables(self, rng, im_stack, th):
        """Initialize flax variables; im_stack (B, H, W, C), th (B, T+1, D)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        conv_vars = self.conv.init(r1, im_stack, train=False)
        feats = self.conv.apply(conv_vars, im_stack, train=False)
        pos = self._head_pos(th)
        if self.recurrent:
            hidden = self.init_hidden(r3, th.shape[0], feats.shape[-1] + pos.shape[-1])
            head_vars = self.head.init(r2, feats, pos, hidden)
        else:
            head_vars = self.head.init(r2, feats, pos, train=False)
        return {"conv": conv_vars, "head": head_vars}

    def init_hidden(self, rng, batch_size, input_len):
        """Zero RNN carry; ``input_len`` = conv-feature len + (T+1)·2."""
        if not self.recurrent:
            return None
        return self.head.initialize_carry(rng, batch_size, input_len)

    # -- forward pieces ------------------------------------------------------

    def stack_inputs(self, im, sdf):
        """Build the (B, H, W, C) conv input per ``sdf_predict`` /
        ``costmap_predict`` (``diff_gpmp2_planner.py:183-186``,
        ``learn_module_fcn.py:25,79-84``)."""
        cfg = self.learn_cfg
        if cfg.costmap_predict:
            from dgpmp2_tpu.ops.sdf import costmap_2d
            safety = cfg.costmap_eps + float(max(self.robot.sphere_radii))
            sdf = costmap_2d(sdf, safety)
        if cfg.sdf_predict or cfg.costmap_predict:
            # costmap_predict implies the map channel is fed even when
            # sdf_predict is off — it selects WHICH map the model sees, it
            # must not be silently discarded.
            out = jnp.stack([im, sdf], axis=-1).astype(cfg.dtype)
        else:
            out = im[..., None].astype(cfg.dtype)
        if cfg.normalize_im:
            from dgpmp2_tpu.models.conv_encoder import normalize_im
            out = normalize_im(out)
        return out

    def conv_features(self, variables, im_stack, train=False, mutable=False):
        return self.conv.apply(
            variables["conv"], im_stack, train=train,
            mutable=["batch_stats"] if mutable else False,
        )

    def predict(
        self,
        variables,
        th,
        feats,
        hidden=None,
        train: bool = False,
        rng=None,
        mutable: bool = False,
        dth_prev=None,
    ):
        """Head forward + covariance decode.

        Returns (covs: DecodedCovariances, new_hidden, new_head_state).
        When ``dtheta_predict`` is on, the previous GN update's positions are
        appended to the trajectory input (``diff_gpmp2_planner.py:198``).
        """
        pos = self._head_pos(th, dth_prev)
        kwargs = {}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        mut = ["batch_stats"] if mutable else False
        if self.recurrent:
            (out, new_hidden), new_state = _apply(
                self.head, variables["head"], mut, feats, pos, hidden, **kwargs
            )
        else:
            out, new_state = _apply(
                self.head, variables["head"], mut, feats, pos, train=train, **kwargs
            )
            new_hidden = None
        covs = cov_lib.decode(
            out.astype(jnp.float32), self.spec,
            self.learn_cfg.dynamics_mode, self.learn_cfg.learn_eps,
            self.learn_cfg.eps_max,
        )
        return covs, new_hidden, new_state

    def graph_params(self, params_fix: graph.GraphParams, covs) -> graph.GraphParams:
        """Apply decoded covariances onto the fixed-parameter template."""
        from dgpmp2_tpu.core import factors

        p = params_fix
        if covs.q_inv is not None:
            p = p.replace(q_inv=covs.q_inv)
        elif covs.qc_inv is not None:
            p = p.replace(q_inv=factors.gp_q_inv(covs.qc_inv, self.spec.dt))
        p = p.replace(obs_inv=covs.obs_inv)
        if covs.eps is not None:
            p = p.replace(eps=covs.eps)
        return p

    # -- planner steps -------------------------------------------------------

    def step(
        self,
        variables,
        params_fix: graph.GraphParams,
        th,
        sdf,
        feats,
        hidden=None,
        train: bool = False,
        rng=None,
        dth_prev=None,
        delta=None,
    ):
        """One learned GN iteration (``diff_gpmp2_planner.py:176-211``).

        Returns (dtheta, err, err_ext, params_used, new_hidden).
        ``feats`` are the conv features (precompute once when
        ``fixed_conv``; recompute per step otherwise).  ``delta``
        overrides the damping — a per-problem (B,) LM lambda applied as
        trust-region scaling (``plan(method='lm')`` threads it); None
        keeps the fixed scalar ``cfg.reg`` GN damping.
        """
        covs, new_hidden, _ = self.predict(
            variables, th, feats, hidden, train=train, rng=rng,
            dth_prev=dth_prev,
        )
        params = self.graph_params(params_fix, covs)
        if delta is None:
            dth = gn.gn_step(
                self.spec, self.robot, params, th, sdf,
                delta=jnp.asarray(self.cfg.reg, th.dtype),
            )
        else:
            dth = gn.gn_step(
                self.spec, self.robot, params, th, sdf,
                delta=delta, trust_region=True,
            )
        err = jax.lax.stop_gradient(
            graph.graph_error(self.spec, self.robot, params, th, sdf)
        )
        # External error under the FULLY fixed params — including eps: a
        # learned eps shrinks the hinge residuals themselves, so evaluating
        # with ``params`` + covariance overrides would still let the model
        # deflate err_ext (the quantity exists precisely so learned weights
        # cannot game it; module docstring).
        err_ext = graph.graph_error(
            self.spec, self.robot, params_fix, th, sdf,
        )
        return dth, err, err_ext, params, new_hidden

    def plan(
        self,
        variables,
        params_fix: graph.GraphParams,
        th_init,
        sdf,
        im,
        max_iters: Optional[int] = None,
        hidden=None,
        track_best: bool = False,
        return_final: bool = False,
    ):
        """Full unrolled learned plan: covariances re-predicted every GN
        iteration (``diff_gpmp2_planner.py:104-166``), compiled as one scan.

        ``track_best`` additionally returns the best non-colliding iterate
        by GP-MSE (the reference evaluation harness's selection,
        ``test_planner.py:253-262``) instead of the final trajectory —
        judged under the FIXED external covariances ``params_fix`` so the
        learned weights cannot game the selection.

        ``return_final`` appends the FINAL iterate as a fifth return value
        (the resume point for staged multi-start, distinct from the
        tracked-best ``th`` when ``track_best`` is on).
        """
        iters = max_iters or self.cfg.max_iters
        lm = self.cfg.method == "lm"
        im_stack = self.stack_inputs(im, sdf)
        feats = self.conv_features(variables, im_stack, train=False)
        if self.recurrent and hidden is None:
            # Zero recurrent carry (the flax cell inits are deterministic;
            # the key only seeds shape metadata).
            hidden = self.init_hidden(
                jax.random.PRNGKey(0), th_init.shape[0],
                feats.shape[-1] + self._head_pos(th_init).shape[-1],
            )

        def best_score(th):
            # Known redundancy: this re-evaluates the factor graph (incl.
            # one SDF lookup) at th_new although the NEXT iteration's step
            # evaluates the same point; gn.plan avoids it by carrying
            # residuals forward (res_next).  Restructuring here must thread
            # the carried residuals through self.step's learned-covariance
            # re-prediction — deferred until eval cost matters.
            res = graph.eval_residuals(self.spec, self.robot, params_fix,
                                       th, sdf)
            colliding = jnp.any(res.r_obs[..., 1:-1, :] > 0, axis=(-2, -1))
            if res.r_obsi is not None:
                # Same rule as gn.plan's best_score: GP-interpolated checks
                # exist to catch penetration between support states — a
                # "best" iterate must clear them too (symmetric with the
                # static opponent's selection).
                colliding = colliding | jnp.any(res.r_obsi > 0,
                                                axis=(-3, -2, -1))
            if res.r_self is not None:
                # Self-collision counts as collision (consistent with
                # gn.plan and multistart's score_candidates).
                colliding = colliding | jnp.any(res.r_self[..., 1:-1, :] > 0,
                                                axis=(-2, -1))
            gp_mse = jnp.mean(jnp.sum(res.r_gp**2, -1), axis=-1)
            return jnp.where(colliding, jnp.inf, gp_mse)

        def body(carry, _):
            th, hid, dth_prev, best, lam = carry
            dth, err, err_ext, params_used, hid = self.step(
                variables, params_fix, th, sdf, feats, hid, train=False,
                dth_prev=dth_prev, delta=lam if lm else None,
            )
            th_new = th + dth
            if lm:
                # LM accept/reject on the moving surface: both errors are
                # evaluated under THIS iteration's predicted covariances
                # (params_used) — comparing against last iteration's error
                # (different covariances) would be meaningless.  Same
                # 10x / /10 lambda schedule as gn.plan
                # (``gpmp2_planner.py:92-103``); covariances beyond
                # reference, LM composition beyond reference too.
                err_prop = jax.lax.stop_gradient(graph.graph_error(
                    self.spec, self.robot, params_used, th_new, sdf))
                accept = err_prop < err
                th_new = jnp.where(accept[:, None, None], th_new, th)
                dth = jnp.where(accept[:, None, None], dth,
                                jnp.zeros_like(dth))
                lam = jnp.where(accept, lam / 10.0, lam * 10.0)
            if track_best:
                best_th, best_s = best
                s = jax.lax.stop_gradient(best_score(th_new))
                better = s < best_s
                best = (jnp.where(better[:, None, None], th_new, best_th),
                        jnp.minimum(s, best_s))
            return (th_new, hid, dth, best, lam), (err, err_ext)

        best0 = ((th_init, jax.lax.stop_gradient(best_score(th_init)))
                 if track_best else ())
        lam0 = jnp.full((th_init.shape[0],), self.cfg.lm_lambda_init,
                        th_init.dtype)
        (th, hidden, _, best, _), (errs, errs_ext) = jax.lax.scan(
            body, (th_init, hidden, jnp.zeros_like(th_init), best0, lam0),
            None, length=iters,
        )
        th_final = th
        if track_best:
            best_th, best_s = best
            th = jnp.where(jnp.isfinite(best_s)[:, None, None], best_th, th)
        if return_final:
            return th, errs, errs_ext, hidden, th_final
        return th, errs, errs_ext, hidden

    def plan_multistart(
        self,
        variables,
        params_fix: graph.GraphParams,
        th_init,
        sdf,
        im,
        rng,
        restarts: int = 8,
        amp: float = 1.5,
        harmonics: int = 3,
        max_iters: Optional[int] = None,
        contact_weight: float = 1e6,
        prune_iters: int = 0,
        keep: int = 0,
    ):
        """Learned covariances composed with batched multi-start seeding:
        plan ``restarts`` endpoint-preserving perturbations of every seed
        as ONE (K·B)-batch through :meth:`plan` (the covariance head
        predicts per candidate), then select per problem
        (:func:`~dgpmp2_tpu.core.multistart.select_best`).

        The two mechanisms attack different failure modes — multi-start
        fixes Gauss-Newton basin selection, learned covariances fix the
        conditioning inside the basin — and their gains compose (wins
        every family vs both parents AND the static+multistart sigma
        oracle; PERFORMANCE.md "Learned covariances × multi-start").
        The reference has neither: its planner loops problems serially
        (``diff_gpmp2_planner.py:92-174``).

        ``prune_iters``/``keep`` enable staged pruning (same contract as
        :func:`dgpmp2_tpu.core.multistart.plan_multistart`): all K seeds
        are planned for ``prune_iters`` iterations, candidates are ranked
        by their phase-1 TRACKED-BEST iterate, and only the ``keep`` best
        per problem finish — resuming from their phase-1 final iterate
        with their recurrent carry (when the head is recurrent).  The
        final selection pools each survivor's phase-1 best and phase-2
        best, so pruning never discards a kept candidate's early winner.
        Known deviation for ``dtheta_predict`` heads: the previous-update
        input resets to zero at the phase boundary (the scan's carry
        convention), so staged results differ slightly from an
        uninterrupted unroll there.

        Returns a :class:`~dgpmp2_tpu.core.multistart.MultistartResult`.
        """
        from dgpmp2_tpu.core.multistart import (
            perturbed_inits, score_candidates, select_best, tile_params,
        )

        if self.spec.use_workspace_goal:
            # track_best + the contact/smoothness score are goal-blind
            # under a workspace goal (core.multistart handles it via
            # final-iterate pools + tip-error scoring); the learned path
            # has no trained configs for that setting yet.
            raise NotImplementedError(
                "plan_multistart does not support use_workspace_goal "
                "specs; use core.multistart.plan_multistart")
        iters = max_iters or self.cfg.max_iters
        staged = prune_iters > 0 or keep > 0
        if staged and not (0 < prune_iters < iters and 0 < keep <= restarts):
            raise ValueError(
                f"staged pruning needs 0 < prune_iters < max_iters and "
                f"0 < keep <= restarts; got prune_iters={prune_iters}, "
                f"max_iters={iters}, keep={keep}, restarts={restarts}"
            )

        b = th_init.shape[0]
        th0s = perturbed_inits(th_init, rng, restarts, amp,
                               self.spec.total_time_sec, harmonics)
        th0s = th0s.reshape(restarts * b, *th0s.shape[2:])
        sdf_t = jnp.tile(sdf, (restarts, 1, 1))
        im_t = jnp.tile(im, (restarts, 1, 1))
        params_t = tile_params(params_fix, b, restarts)

        if not staged:
            th, _, _, _ = self.plan(
                variables, params_t, th0s, sdf_t, im_t, max_iters=iters,
                track_best=True,
            )
            return select_best(self.spec, self.robot, th, sdf_t, restarts,
                               b, contact_weight=contact_weight)

        # Phase 1: all K seeds — tracked-best iterates rank the candidates
        # (and enter the selection pool); final iterates are the resume
        # points.
        best1, _, _, hidden1, th1 = self.plan(
            variables, params_t, th0s, sdf_t, im_t, max_iters=prune_iters,
            track_best=True, return_final=True,
        )
        score1, _ = score_candidates(self.spec, self.robot, best1, sdf_t,
                                     contact_weight)
        _, idx = jax.lax.top_k(-score1.reshape(restarts, b).T, keep)

        def gather(x):
            xb = jnp.moveaxis(
                x.reshape(restarts, b, *x.shape[1:]), 0, 1
            )  # (B, K, ...)
            ix = idx.reshape(idx.shape + (1,) * (xb.ndim - 2))
            kept = jnp.take_along_axis(xb, ix, axis=1)
            return jnp.moveaxis(kept, 0, 1).reshape(keep * b, *x.shape[1:])

        sdf_k = jnp.tile(sdf, (keep, 1, 1))
        th2, _, _, _ = self.plan(
            variables, tile_params(params_fix, b, keep), gather(th1), sdf_k,
            jnp.tile(im, (keep, 1, 1)),
            max_iters=iters - prune_iters, track_best=True,
            hidden=jax.tree.map(gather, hidden1),
        )
        # Select over each survivor's phase-1 best AND phase-2 best.
        pool = jnp.concatenate([gather(best1), th2], axis=0)
        return select_best(self.spec, self.robot, pool,
                           jnp.tile(sdf, (2 * keep, 1, 1)), 2 * keep, b,
                           contact_weight=contact_weight)


def _apply(module, variables, mutable, *args, **kwargs):
    out = module.apply(variables, *args, mutable=mutable, **kwargs)
    if mutable:
        return out
    return out, None
