"""Inverse rendering: recover scene parameters from target images.

Realizes BASELINE.json config 5 (recover BSDF albedo + light emission via
pixel-loss gradients). No counterpart exists in the reference — its
renderer is forward-only; differentiability is the point of this
framework.

Design: the render pass is differentiable w.r.t. SceneData leaves; a
trainable subset is lifted into a params dict, spliced into the scene
per step, and optimized with optax under a jitted SPMD train step
(wavefront sharded, params replicated, gradient all-reduce by XLA).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass_pixels
from phosphorus_mk2_tpu.parallel.sharding import make_wave_mesh, shard_pixels

TRAINABLE_FIELDS = ("emission", "lobe_weight", "lobe_param", "vertices", "normals")


class InverseRenderer:
    """Gradient-descent loop recovering scene parameters.

    target: (H, W, 3) image. trainable: subset of TRAINABLE_FIELDS.
    spp: samples per gradient step (fresh RNG per step — stochastic
    gradient over the path integral).
    """

    def __init__(
        self,
        scene,
        target,
        trainable=("emission", "lobe_weight"),
        *,
        learning_rate: float = 5e-2,
        spp: int = 4,
        max_depth: int = 3,
        use_bvh: bool = True,
        n_devices=None,
        seed: int = 0,
        optimizer=None,
        fresh_rng: bool = True,
        log_emission: bool = False,
        unbiased_loss: bool = False,
        views=None,
        sorted_dispatch: bool = False,
    ):
        """fresh_rng: new sample paths per step (unbiased stochastic
        gradients); False reuses one fixed path set — deterministic
        convergence to that set's noise floor (useful for tests).
        log_emission: optimize emission in LOG space (emission =
        exp(theta)): radiance scales are multiplicative, so absolute
        Adam steps on raw emission either crawl (bright lights are many
        units from a wrong start) or blow up dim channels; log-space
        makes the step relative. Measured necessity: BMW config-5 lamp
        recovery plateaued at 40-61% relative error in raw space.
        unbiased_loss: double-sample MSE — the loss is the per-pixel dot
        product of residuals from TWO independent renders, each at
        spp/2. A single-render MSE contains the estimator's own variance
        Var(img), which DEPENDS on the parameters (dimmer lights render
        with less MC noise), so stochastic optimization converges to a
        darkened scene: measured on BMW config-5, loss(true params) =
        1.48 > loss(dim recovered point) = 1.03 (tools/bmw_c5_probe.py).
        E[(img1-t)(img2-t)] = bias^2 + Var(target) instead — the
        parameter-dependent variance term cancels. Same cost per step
        (the spp budget is split).
        views: optional list of (camera, target_image) pairs — steps
        round-robin over views (step i uses view i % V), all under ONE
        jit: the per-view camera params are stacked and indexed with a
        traced view id, so no recompile per view. A single 192² view of
        the BMW observes the G/B lamp channels only through indirect
        paint bounces (measured: G/B rel err plateaus ~3x worse than R,
        tools/bmw_config5b.py); extra views make them identifiable.
        When set, `target` is ignored; all views must share the primary
        camera's resolution."""
        for f in trainable:
            if f not in TRAINABLE_FIELDS:
                raise ValueError(f"not trainable: {f}")
        self.scene = scene
        self.trainable = tuple(trainable)
        self.spp = spp
        self._max_depth = max_depth
        self._use_bvh = use_bvh

        data = scene.build()
        if use_bvh:
            from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh

            data = attach_bvh(data)
        self.data = data
        self.mesh = make_wave_mesh(n_devices)
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.data = jax.device_put(self.data, NamedSharding(self.mesh, P()))

        view_list = list(views) if views else [(scene.camera, target)]
        self._n_views = len(view_list)
        w, h = scene.camera.width, scene.camera.height
        for vc, vt in view_list:
            if (vc.width, vc.height) != (w, h):
                raise ValueError(
                    f"view resolution {vc.width}x{vc.height} != "
                    f"primary {w}x{h}"
                )
        # (V,)-stacked camera leaves, indexed per step with a traced id
        cams = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x, jnp.float32) for x in xs]),
            *[camera_to_params(vc) for vc, _ in view_list],
        )
        tracer = make_tracer(data, use_bvh)
        px, py, n_valid = shard_pixels(self.mesh, w, h)
        targets_flat = np.stack([
            np.asarray(vt, np.float32).reshape(-1, 3) for _, vt in view_list
        ])  # (V, H*W, 3)
        pad = px.shape[0] - targets_flat.shape[1]
        targets_flat = np.pad(targets_flat, ((0, 0), (0, pad), (0, 0)))
        target_dev = jax.device_put(
            targets_flat, NamedSharding(self.mesh, P(None, "wave"))
        )
        mask = (np.arange(px.shape[0]) < n_valid).astype(np.float32)[:, None]
        mask_dev = jax.device_put(mask, NamedSharding(self.mesh, P("wave")))

        self._log_emission = bool(log_emission) and "emission" in self.trainable
        self.params = {f: getattr(data, f) for f in self.trainable}
        if self._log_emission:
            self.params["emission"] = jnp.log(
                jnp.maximum(data.emission, 1e-6)
            )
        _log_em = self._log_emission
        self.opt = optimizer or optax.adam(learning_rate)
        self.opt_state = self.opt.init(self.params)
        self.key = jax.random.key(seed)
        self._step_count = 0

        _unbiased = bool(unbiased_loss)
        half = max(1, spp // 2)

        trainable_t = self.trainable

        def _render(sd, cam, key, n):
            out = render_pass_pixels(
                sd, cam, key, 0, n, px, py, max_depth=max_depth,
                tracer=tracer,
                sorted_dispatch=sorted_dispatch,  # AD-capable since
                # round 5 (custom_vjp) but MEASURED A LOSS on the BMW
                # grad step (1.08 vs 1.21 Mrays/s — the sorted sweep's
                # sort + chunked vjp overheads beat the 5-type dispatch
                # saving there; tools/tpu_r5b_bwd.py bwd_emlw_sorted).
                # Default off for optimization; opt in for scenes with
                # many expensive lobe types. Forward renders keep the
                # sorted path (2.35x, trace_sample default).
                sample_unroll=n,  # FULL unroll: no sample scan, so the
                # backward fuses across samples (measured 27.7 -> 32.1
                # Mrays/s on the bench grad, tools/tpu_r4e_front.py;
                # partial unroll was worse)
                trainable=trainable_t,  # sever non-trainable grad
                # chains — the backward pays only for this param set
                # (round-5; grads for the set itself are identical)
            )
            return out["color"] / n

        def loss_fn(params, scene_data, key, view_idx):
            fields = dict(params)
            if _log_em:
                fields["emission"] = jnp.exp(fields["emission"])
            sd = dataclasses.replace(scene_data, **fields)
            cam = jax.tree_util.tree_map(lambda x: x[view_idx], cams)
            tgt = target_dev[view_idx]
            if _unbiased:
                k1, k2 = jax.random.split(key)
                e1 = (_render(sd, cam, k1, half) - tgt) * mask_dev
                e2 = (_render(sd, cam, k2, half) - tgt) * mask_dev
                return jnp.sum(e1 * e2) / jnp.sum(mask_dev)
            err = (_render(sd, cam, key, spp) - tgt) * mask_dev
            return jnp.sum(err * err) / jnp.sum(mask_dev)

        @jax.jit
        def train_step(params, opt_state, scene_data, key, view_idx):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, scene_data, key, view_idx
            )
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = train_step

        self._fresh_rng = fresh_rng

    def step(self) -> float:
        if self._fresh_rng:
            self.key, sub = jax.random.split(self.key)
        else:
            sub = self.key
        vi = jnp.int32(self._step_count % self._n_views)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, self.data, sub, vi
        )
        self._step_count += 1
        return float(loss)

    def run(self, n_steps: int, log_every: int = 0) -> list:
        losses = []
        for i in range(n_steps):
            loss = self.step()
            losses.append(loss)
            if log_every and (i + 1) % log_every == 0:
                print(f"step {i + 1}: loss={loss:.6f}")
        return losses

    def current_scene(self):
        fields = dict(self.params)
        if self._log_emission:
            fields["emission"] = jnp.exp(fields["emission"])
        return dataclasses.replace(self.data, **fields)

    def render_current(self, spp: int = 8):
        """(H, W, 3) render of the scene with the recovered parameters
        (for previews / convergence inspection)."""
        from phosphorus_mk2_tpu.core.options import Options
        from phosphorus_mk2_tpu.integrator.path import render_aovs

        out = render_aovs(
            self.current_scene(),
            self.scene.camera,
            spp=spp,
            max_depth=self._max_depth,
            options=Options(use_bvh=self._use_bvh, samples_per_pass=spp),
        )
        return np.asarray(out["color"])

    # --- checkpoint / resume (no reference counterpart; SURVEY §5.4) --

    def save_checkpoint(self, path: str) -> None:
        """Write params + optimizer state + step counter (npz)."""
        flat_params = {
            f"param_{k}": np.asarray(v) for k, v in self.params.items()
        }
        leaves, treedef = jax.tree_util.tree_flatten(self.opt_state)
        flat_opt = {f"opt_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
        tmp = path + ".tmp.npz"
        np.savez(
            tmp[:-4],
            step=self._step_count,
            key=jax.random.key_data(self.key),
            **flat_params,
            **flat_opt,
        )
        import os

        os.replace(tmp, path)

    def load_checkpoint(self, path: str) -> None:
        ck = np.load(path)
        self.params = {
            k: jnp.asarray(ck[f"param_{k}"]) for k in self.params
        }
        leaves, treedef = jax.tree_util.tree_flatten(self.opt_state)
        new_leaves = [
            jnp.asarray(ck[f"opt_{i}"]) for i in range(len(leaves))
        ]
        self.opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        self._step_count = int(ck["step"])
        self.key = jax.random.wrap_key_data(ck["key"])
