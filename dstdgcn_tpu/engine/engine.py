"""Prediction engine: jitted training/eval loops, optimizer, checkpointing.

Re-design of the reference ``PredictionEngine`` (engine/prediction.py:104-430)
around a single compiled ``train_step``: instead of a Python batch loop
issuing per-op kernels, the forward + inverse-sequence forward + backward +
Adam update execute as one XLA program per batch.  Evaluation (dim scatter,
joint fixups, per-frame MPJPE) also runs on device.

Semantics preserved from the reference:
  * loss registry binding with weights (ModelWrapper, prediction.py:22-101);
  * inverse-sequence training averages the two directions' losses
    (prediction.py:267-287);
  * Adam + StepLR(step_size, gamma) stepped per epoch (prediction.py:184-196);
  * both forwards run in train mode (BatchNorm batch stats + updates twice
    per step, in order);
  * checkpoints carry model/optimizer/lr/epoch and best-error tracking.
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..data import transforms as tfm
from ..utils import profiling
from . import losses as L

Array = jax.Array


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    dropout_key: Array


def steplr(lr0: float, gamma: float, step_size: int) -> Callable[[int], float]:
    """torch StepLR: lr(epoch) = lr0 * gamma ** (epoch // step_size)."""

    def schedule(epoch: int) -> float:
        return lr0 * (gamma ** (epoch // step_size))

    return schedule


class PredictionEngine:
    """Owns model state, optimizer, compiled steps, and checkpoints.

    ``config`` is the ``engine`` block of the experiment config (same schema
    as the reference: learn{opt,lr,weight_decay,gamma,step_size},
    loss{name: [type, weight]}, n_out, transform, use_weight, inverse,
    max_iter, optional clip).
    """

    def __init__(self, config: Dict[str, Any], model, logger=None,
                 bone_incidence: Optional[np.ndarray] = None,
                 mesh=None, data_sharding=None):
        self.model = model
        self.config = config
        self.logger = logger
        self.mesh = mesh
        self.data_sharding = data_sharding

        reg = L.registry(bone_incidence)
        # loss spec: [type, weight] or [type, weight, out_idx] for
        # multi-output models (reference ModelWrapper n_out>1 binding,
        # prediction.py:33-44)
        self.n_out = int(config.get("n_out", 1))
        self.loss_funcs: Dict[str, Tuple[Callable, float, int]] = {}
        for name, spec in config["loss"].items():
            out_idx = int(spec[2]) if len(spec) > 2 else 0
            if out_idx >= self.n_out:
                raise ValueError(
                    f"loss {name!r} binds output {out_idx} but n_out="
                    f"{self.n_out}")
            self.loss_funcs[name] = (reg[spec[0]], float(spec[1]), out_idx)

        self.transform_fn, self.inverse_fn = tfm.get_transform(
            config.get("transform", "tsc"))

        learn = config["learn"]
        self.lr_schedule = steplr(float(learn["lr"]), float(learn["gamma"]),
                                  int(learn["step_size"]))
        self.lr = float(learn["lr"])
        wd = float(learn.get("weight_decay", 0.0))
        clip = float(config.get("clip", -1))
        solver_cfg = dict(config.get("solver") or {})
        if solver_cfg:
            # per-parameter-group optimizer (engine.solver block: reference
            # solver/build.py:10-22 capability): the bias group gets
            # lr * bias_lr_factor; the StepLR schedule still drives the one
            # injected learning_rate, so both groups follow it
            from .solver import make_optimizer
            solver_cfg.setdefault("weight_decay", wd)
            self.tx = optax.inject_hyperparams(
                lambda learning_rate: make_optimizer(
                    dict(solver_cfg, base_lr=learning_rate)))(
                learning_rate=self.lr)
        # torch Adam's weight_decay is L2-added-to-grad, i.e. optax
        # add_decayed_weights before adam — matches prediction.py:187-192
        elif wd > 0:
            self.tx = optax.inject_hyperparams(
                lambda learning_rate: optax.chain(
                    optax.add_decayed_weights(wd),
                    optax.adam(learning_rate)))(learning_rate=self.lr)
        else:
            self.tx = optax.inject_hyperparams(optax.adam)(
                learning_rate=self.lr)
        if clip > 0:
            self.tx = optax.chain(optax.clip_by_global_norm(clip), self.tx)
        self._clip = clip
        self._callbacks = None

        self.best_err = float("inf")
        self.state: Optional[TrainState] = None
        self._train_step = None
        self._train_key = None
        self._eval_step_cache: Dict[Any, Callable] = {}

    # -- mesh plumbing ------------------------------------------------------

    def _mesh_ctx(self):
        """Activation-sharding context: pins (N,T,V,C) activations to the
        (data, graph) mesh layout during tracing (see parallel/mesh.py)."""
        import contextlib
        if self.mesh is None:
            return contextlib.nullcontext()
        from ..parallel.mesh import activation_sharding_context
        return activation_sharding_context(self.mesh)

    def _put_batch(self, *arrays):
        """Place per-batch host arrays; shard batch axis when a mesh is set
        and the batch divides the data axis (last ragged batch replicates).
        Under a multi-host launch, each process's local shard is stitched
        into one global array (parallel.distributed.make_global_batch)."""
        out = tuple(jnp.asarray(a, jnp.float32) for a in arrays)
        if self.mesh is None or self.data_sharding is None:
            return out
        n_global = out[0].shape[0] * jax.process_count()
        if n_global % self.mesh.shape.get("data", 1) != 0:
            return out
        from ..parallel.distributed import make_global_batch
        return make_global_batch(out, self.data_sharding)

    # -- state ------------------------------------------------------------

    def init(self, sample_input: np.ndarray, seed: int = 777) -> TrainState:
        """Initialize model + optimizer state from a sample flat batch."""
        x = self.transform(jnp.asarray(sample_input[:1], jnp.float32))
        variables = self.model.init({"params": jax.random.key(seed)}, x,
                                    train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        opt_state = self.tx.init(params)
        # engine.prng_impl selects the dropout PRNG ("rbg" is the cheaper
        # counter-based TPU generator; threefry default for bit-stability
        # with the parity configs).  Measured r5 (flagship batch 128):
        # dropout costs ~0.12 ms in the forward (PROBES_r05 fwd_train
        # rows) and the same-session train-step deltas rbg-vs-threefry
        # across four r5 pairs are -5.3 / -3.3 / -0.26 / +0.58 ms
        # (committed snapshot: 34.9 vs 38.2; full record PROBES_r05.md)
        # — within tunnel noise at worst, multi-ms in rbg's favor at
        # best, so the tuned configs ship prng_impl: rbg.  Masks remain
        # iid Bernoulli; only the random stream differs.
        impl = self.config.get("prng_impl") or None
        dropout_key = (jax.random.key(seed + 1) if impl is None
                       else jax.random.key(seed + 1, impl=impl))
        self.state = TrainState(params=params, batch_stats=batch_stats,
                                opt_state=opt_state,
                                dropout_key=dropout_key)
        if self.mesh is not None:
            # place model/optimizer state on the mesh: replicated for plain
            # DP/graph sharding, channel-dim-sharded over the optional
            # tensor-parallel "model" axis (parallel/mesh.py rules); the
            # Adam moments mirror the param tree so the same name-based
            # rule shards them consistently
            from ..parallel.mesh import param_sharding, place_tree
            shardings = param_sharding(self.mesh, self.state)
            self.state = place_tree(self.state, shardings)
        if self.logger is not None:
            n = sum(p.size for p in jax.tree.leaves(params))
            self.logger.info(
                f"Trainable number of parameters of the network is: {n}")
        return self.state

    def num_params(self) -> int:
        return sum(p.size for p in jax.tree.leaves(self.state.params))

    # -- transforms -------------------------------------------------------

    def transform(self, x: Array) -> Array:
        return x if self.transform_fn is None else self.transform_fn(x)

    def inverse(self, x: Array) -> Array:
        return x if self.inverse_fn is None else self.inverse_fn(x)

    # -- compiled steps ---------------------------------------------------

    def _build_train_step(self, time_tsfm, scale_tsfm, weights):
        inverse_training = bool(self.config.get("inverse", False))
        loss_funcs = self.loss_funcs
        model = self.model
        wvec = None if weights is None else jnp.asarray(weights, jnp.float32)

        def inverse_out(out):
            out = self.inverse(out)
            if scale_tsfm is not None:
                out = scale_tsfm.inverse(out)
            if time_tsfm is not None:
                out = time_tsfm.inverse(out)
            return out

        def one_pass(params, batch_stats, rng, inputs, targets):
            x = inputs
            if time_tsfm is not None:
                x = time_tsfm.transform(x)
            x = self.transform(x)
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
            outs = ([inverse_out(o) for o in out]
                    if isinstance(out, (list, tuple)) else [inverse_out(out)])

            def per_output_target(o):
                t_out, t_tgt = o.shape[1], targets.shape[1]
                return targets[:, -t_out:] if t_out != t_tgt else targets

            losses = {name: w * fn(outs[i], per_output_target(outs[i]), wvec)
                      for name, (fn, w, i) in loss_funcs.items()}
            return losses, mut["batch_stats"]

        def loss_fn(params, batch_stats, rng, inputs, inputs_inv, targets):
            r1, r2 = jax.random.split(rng)
            losses, batch_stats = one_pass(params, batch_stats, r1, inputs,
                                           targets)
            total = functools.reduce(jnp.add, losses.values())
            if inverse_training:
                targets_inv = targets[:, ::-1]
                losses_inv, batch_stats = one_pass(
                    params, batch_stats, r2, inputs_inv, targets_inv)
                total = (total + functools.reduce(
                    jnp.add, losses_inv.values())) / 2
            return total, (losses, batch_stats)

        def train_step(state: TrainState, inputs, inputs_inv, targets, lr):
            rng, new_key = jax.random.split(state.dropout_key)
            (total, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats, rng,
                                       inputs, inputs_inv, targets)
            # report the optimized objective too (the halved two-direction
            # total under inverse training, prediction.py:267-287) so the
            # lockstep parity test can track the reference trajectory
            # step for step
            losses = dict(losses, total=total)
            opt_state = optax.tree_utils.tree_set(
                state.opt_state, learning_rate=lr)
            updates, opt_state = self.tx.update(grads, opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return (TrainState(params=params, batch_stats=new_stats,
                               opt_state=opt_state, dropout_key=new_key),
                    losses)

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self, key, input_n, eval_frame, dim_used,
                         idx_ignore, idx_equal, time_tsfm, scale_tsfm):
        model = self.model
        eval_frame = tuple(int(j) for j in eval_frame)
        # engine.fused_inference: serve eval through the whole-encoder
        # Pallas kernel (models/infer.py) — activations stay in VMEM across
        # every encoder layer; eval-mode parity with model.apply is
        # golden-tested (tests/test_engine.py)
        fused_inf = bool(self.config.get("fused_inference", False))

        def eval_step(params, batch_stats, inputs, all_seqs):
            x = inputs
            x = self.transform(x)
            variables = {"params": params, "batch_stats": batch_stats}
            if fused_inf:
                from ..models import infer
                from ..models.autotune import resolve_knob
                cd = resolve_knob("compute_dtype", model.compute_dtype,
                                  x.shape[0],
                                  getattr(model, "auto_batch_hint", None))
                dt = None if cd is None else jnp.dtype(cd)
                out = infer.fused_eval_forward(
                    variables, x, num_layers=model.num_layers,
                    fast=model.fast, dtype=dt)
            else:
                out = model.apply(variables, x, train=False)
            if isinstance(out, (list, tuple)):   # multi-output: use the last
                out = out[-1]                    # (ModelWrapper.forward :54)
            out = self.inverse(out)
            if scale_tsfm is not None:
                out = scale_tsfm.inverse(out)
            if time_tsfm is not None:
                out = time_tsfm.inverse(out)

            n, seq_len, _ = all_seqs.shape
            pred = all_seqs
            if dim_used is not None:
                du = jnp.asarray(dim_used)
                if out.shape[1] != seq_len:
                    pred = pred.at[:, input_n:, du].set(out)
                else:
                    pred = pred.at[:, :, du].set(out)
            else:
                if out.shape[1] != seq_len:
                    pred = pred.at[:, input_n:].set(out)
                else:
                    pred = out
            if idx_ignore is not None:
                ii = jnp.asarray(idx_ignore)
                ie = jnp.asarray(idx_equal)
                pred = pred.at[:, :, ii].set(pred[:, :, ie])
            pred_p = pred.reshape(n, seq_len, -1, 3)[:, input_n:]
            targ_p = all_seqs.reshape(n, seq_len, -1, 3)[:, input_n:]
            # per-eval-frame mean joint L2 (summed over batch via * n later)
            ef = jnp.asarray(eval_frame)
            d = jnp.linalg.norm(pred_p[:, ef] - targ_p[:, ef], axis=-1)
            metric = jnp.mean(d, axis=(0, 2)) * n        # (len(eval_frame),)
            return metric, pred_p

        return jax.jit(eval_step)

    # -- epochs -----------------------------------------------------------

    def train(self, train_loader, epoch: int, time_tsfm=None, scale_tsfm=None,
              weights=None, max_iter: int = -1) -> float:
        """One training epoch; returns the summed average losses."""
        assert self.state is not None, "call init() first"
        self.lr = self.lr_schedule(epoch)
        key = (id(time_tsfm), id(scale_tsfm), weights is not None)
        if self._train_step is None or self._train_key != key:
            self._train_step = self._build_train_step(time_tsfm, scale_tsfm,
                                                      weights)
            self._train_key = key

        # optional callback-driven logging (engine.callbacks block): windowed
        # per-loss CSV via utils.callbacks.CallbackLogger; save/eval/visual
        # callbacks remain library-level registrations on engine.callbacks
        cb_cfg = self.config.get("callbacks")
        if cb_cfg and self._callbacks is None:
            from ..utils.callbacks import CallbackLogger
            self._callbacks = CallbackLogger(
                str(cb_cfg.get("log_dir", ".")), epoch=epoch,
                name=str(cb_cfg.get("name", "train")))
            self._last_losses: Dict[str, float] = {}
            self._callbacks.add_loss_log(
                lambda: self._last_losses, int(cb_cfg.get("loss_freq", 1)),
                int(cb_cfg.get("window", 100)))

        t_l = {name: L.AccumLoss() for name in self.loss_funcs}
        num_iter = (len(train_loader) if max_iter == -1
                    else min(len(train_loader), max_iter))
        lr = jnp.asarray(self.lr, jnp.float32)
        it = iter(train_loader)
        desc = ""
        timer = profiling.StepTimer(skip_first=1)
        profile_dir = self.config.get("profile", None)
        profile_steps = int(self.config.get("profile_steps", 5))
        # failure detection: fail fast on non-finite losses with context
        # (engine.detect_anomaly config key; the reference trains blind)
        detect_anomaly = bool(self.config.get("detect_anomaly", False))
        tracing = False
        for i in range(num_iter):
            try:
                inputs, inputs_inv, targets, _ = next(it)
            except StopIteration:
                break
            n = inputs.shape[0]
            # capture an XLA trace of a few post-compilation steps of the
            # first epoch when engine.profile is set
            if profile_dir and epoch == 0:
                if i == 1:
                    jax.profiler.start_trace(profile_dir)
                    tracing = True
                elif tracing and i == 1 + profile_steps:
                    jax.profiler.stop_trace()
                    tracing = False
            timer.tic()
            batch = self._put_batch(inputs, inputs_inv, targets)
            with self._mesh_ctx():
                self.state, losses = self._train_step(self.state, *batch, lr)
            jax.block_until_ready(losses)
            timer.toc()
            if detect_anomaly:
                bad = [name for name, val in losses.items()
                       if not np.isfinite(float(val))]
                if bad:
                    raise FloatingPointError(
                        f"non-finite loss {bad} at epoch {epoch + 1} "
                        f"step {i + 1} (lr={float(lr):.2e}); enable "
                        f"smaller lr or clipping")
            for name, val in losses.items():
                if name == "total":   # reported objective, not a loss term
                    continue
                t_l[name].update(float(val) * n, n)   # KeyError on drift
            if self._callbacks is not None:
                self._last_losses = {name: float(val)
                                     for name, val in losses.items()}
                self._callbacks.step()
            desc = f"epoch: {epoch + 1}|[{i + 1}/{num_iter}]|train|" + "".join(
                "{}:{:.2f}|".format(name, t_l[name].avg) for name in t_l)
        if tracing:
            jax.profiler.stop_trace()
        if self._callbacks is not None:
            self._callbacks.end_epoch()
        if self.logger is not None:
            self.logger.info(desc)
            self.logger.info(f"epoch {epoch + 1} step timing: "
                             f"{timer.summary()}")
        return sum(acc.avg for acc in t_l.values())

    def test(self, test_loader, input_n: int = 10, eval_frame=None,
             dim_used=None, joint_to_ignore=None, joint_equal=None,
             time_tsfm=None, scale_tsfm=None, action=None,
             save_path=None) -> Tuple[float, np.ndarray]:
        """Evaluation sweep; returns (avg metric, per-eval-frame metrics).

        Protocol parity with reference engine.test (prediction.py:319-430):
        predictions are scattered into the full-skeleton sequence over
        ``dim_used``, ignored joints are copied from their "equal" sources,
        and MPJPE is computed on the output frames only.
        """
        assert self.state is not None, "call init() first"
        assert eval_frame is not None
        eval_frame = np.asarray(eval_frame)
        dim_used = None if dim_used is None else np.asarray(dim_used)
        idx_ignore = idx_equal = None
        if joint_to_ignore is not None and np.asarray(
                joint_to_ignore).dtype != object and np.asarray(
                joint_to_ignore).size and not np.any(
                np.asarray(joint_to_ignore) == None):  # noqa: E711
            ji = np.asarray(joint_to_ignore)
            je = np.asarray(joint_equal)
            idx_ignore = np.concatenate([ji * 3, ji * 3 + 1, ji * 3 + 2])
            idx_equal = np.concatenate([je * 3, je * 3 + 1, je * 3 + 2])

        cache_key = (input_n, tuple(eval_frame.tolist()),
                     None if dim_used is None else tuple(dim_used.tolist()),
                     None if idx_ignore is None else tuple(idx_ignore),
                     id(time_tsfm), id(scale_tsfm))
        step = self._eval_step_cache.get(cache_key)
        if step is None:
            step = self._build_eval_step(
                cache_key, input_n, eval_frame, dim_used, idx_ignore,
                idx_equal, time_tsfm, scale_tsfm)
            self._eval_step_cache[cache_key] = step

        t_metric = np.zeros(len(eval_frame))
        t_l = L.AccumLoss()
        total_n = 0
        save_results = {"result": [], "target": []} if save_path else None
        for inputs, _, _, all_seqs in test_loader:
            n = inputs.shape[0]
            batch = self._put_batch(inputs, all_seqs)
            with self._mesh_ctx():
                metric, pred_p = step(self.state.params,
                                      self.state.batch_stats, *batch)
            metric = np.asarray(metric)
            t_metric += metric
            for m in metric:
                t_l.update(float(m), n)
            total_n += n
            if save_results is not None:
                save_results["result"].append(np.asarray(pred_p))
                seq = np.asarray(all_seqs, np.float32)
                save_results["target"].append(
                    seq.reshape(n, seq.shape[1], -1, 3)[:, input_n:])
        t_metric /= max(total_n, 1)
        if self.logger is not None:
            self.logger.info(
                f"action: {action or 'NA'}|test|loss:{t_l.avg:.2f}")
        if save_results is not None:
            np.savez(str(save_path) + ".npz",
                     target=np.concatenate(save_results["target"]),
                     result=np.concatenate(save_results["result"]))
        return t_l.avg, t_metric

    # -- checkpointing ----------------------------------------------------

    def save(self, checkpoint_dir: str, err: float, epoch: int,
             is_best: bool = False) -> None:
        from .checkpoint import save_checkpoint
        os.makedirs(checkpoint_dir, exist_ok=True)
        payload = dict(lr=self.lr, err=err, epoch=epoch)
        save_checkpoint(os.path.join(checkpoint_dir, "last.ckpt"),
                        self.state, payload)
        if is_best:
            save_checkpoint(os.path.join(checkpoint_dir, "best.ckpt"),
                            self.state, payload)

    def recover(self, checkpoint_path: str,
                model_only: bool = False) -> Tuple[int, float]:
        from .checkpoint import restore_checkpoint
        state, payload = restore_checkpoint(checkpoint_path, self.state)
        if not model_only:
            self.state = state
            self.lr = payload["lr"]
        else:
            self.state = self.state.replace(params=state.params,
                                            batch_stats=state.batch_stats)
        if self.logger is not None:
            self.logger.info(
                "load from lr {}, curr_avg {} from {}.".format(
                    payload["lr"], payload["err"], checkpoint_path))
        return payload["epoch"], payload["err"]
