"""Training runtime: loop, metrics, checkpoint/resume, validation, early stop.

Reimplements the reference Trainer (steps/trainer.py:21-467) on the JAX stack:
  * DDP + GradScaler + explicit all-reduces -> one jitted sharded step
    (training/step.py) over a device mesh; metrics come back as globals.
  * checkpoint bundles (bundle.pth/best_bundle.pth + args.pkl + progress.pkl,
    trainer.py:215-240) -> an orbax directory per tag holding the train-state
    pytree, plus json sidecars for configs and progress.
  * mid-epoch sampler fast-forward (trainer.py:343-344) -> the deterministic
    batcher regenerates the epoch's batch list and skips `batch_in_epoch`.
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import asdict
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig, TrainConfig
from ..models.voicecraft import init_params, param_count
from ..data.manifest import ManifestDataset, DynamicBatcher, collate_train
from .optim import scaled_adam, adamw_reference, eden_schedule, linear_warmup_decay
from .step import make_train_step

log = logging.getLogger("voicecraft_tpu.trainer")


def _pad_batch(batch, B_target: int):
    """Pad a TrainBatch with fully-masked rows (target_valid all False) so
    the batch dim divides the grad-accumulation factor; padded rows
    contribute nothing to loss or metrics."""
    B = batch.x.shape[0]
    if B == B_target:
        return batch

    def pad(x, fill=0):
        widths = [(0, B_target - B)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    from ..models.voicecraft import TrainBatch
    return TrainBatch(
        x=pad(batch.x), x_lens=pad(batch.x_lens, 1),
        y_tokens=pad(batch.y_tokens), y_lens=pad(batch.y_lens, 1),
        mask_emb_idx=pad(batch.mask_emb_idx, -1),
        target_valid=pad(batch.target_valid, False))


def _pad_batch_full(batch, mcfg, B_t: int, Sx_t: int, Sy_t: int):
    """Pad a TrainBatch to fixed (B_t, Sx_t, Sy_t) dims.  Multi-host
    training needs every host to present identical local shapes (the global
    batch is one GSPMD array); padded rows are fully masked, padded time
    slots carry pad tokens / target_valid=False so they contribute
    nothing."""
    from ..models.voicecraft import TrainBatch
    B, Sx = batch.x.shape
    Sy = batch.y_tokens.shape[2]
    assert B <= B_t and Sx <= Sx_t and Sy <= Sy_t, \
        ((B, Sx, Sy), (B_t, Sx_t, Sy_t))

    def pad(a, widths, fill):
        return jnp.pad(a, widths, constant_values=fill)

    return TrainBatch(
        x=pad(batch.x, ((0, B_t - B), (0, Sx_t - Sx)), mcfg.text_pad_token),
        x_lens=pad(jnp.maximum(batch.x_lens, 1), ((0, B_t - B),), 1),
        y_tokens=pad(batch.y_tokens,
                     ((0, B_t - B), (0, 0), (0, Sy_t - Sy)),
                     mcfg.audio_pad_token),
        y_lens=pad(jnp.maximum(batch.y_lens, 1), ((0, B_t - B),), 1),
        mask_emb_idx=pad(batch.mask_emb_idx,
                         ((0, B_t - B), (0, Sy_t - Sy)), -1),
        target_valid=pad(batch.target_valid,
                         ((0, B_t - B), (0, 0), (0, Sy_t - Sy)), False))


class Trainer:
    def __init__(self, mcfg: ModelConfig, tcfg: TrainConfig, mesh=None,
                 tb_writer=None, init_from: str = None,
                 train_mtp_only: bool = False):
        """``init_from``: initialise params from an existing checkpoint
        (.pth / HF snapshot / orbax exp dir / preset — anything
        inference.loader.load_model accepts) instead of random init; missing
        extension params (e.g. MTP heads when mcfg.n_mtp > 0) are freshly
        initialised.  ``train_mtp_only`` masks every gradient except
        params['mtp_heads'], so the base model stays bit-identical — the
        PAPERS.md arXiv 2410.13839 recipe of grafting speculative-decoding
        heads onto a frozen pretrained checkpoint."""
        if (jax.default_backend() == "cpu"
                and mcfg.compute_dtype == "bfloat16"):
            # CPU XLA lacks bf16xbf16->f32 dots; TPU keeps bf16
            import dataclasses as _dc
            mcfg = _dc.replace(mcfg, compute_dtype="float32")
            log.info("cpu backend: compute dtype bfloat16 -> float32")
        self.mcfg, self.tcfg = mcfg, tcfg
        self.mesh = mesh
        self.start_time = time.time()
        os.makedirs(tcfg.exp_dir, exist_ok=True)

        self.train_ds = ManifestDataset(mcfg, tcfg, "train")
        try:
            self.valid_ds = ManifestDataset(mcfg, tcfg, "validation")
        except FileNotFoundError:
            self.valid_ds = None

        # copy the phoneme vocab next to the checkpoints so they are
        # self-contained for inference (reference gigaspeech.py:31)
        if jax.process_index() == 0:
            import shutil
            src_vocab = os.path.join(tcfg.dataset_dir, "vocab.txt")
            if os.path.exists(src_vocab):
                shutil.copy(src_vocab, os.path.join(tcfg.exp_dir, "vocab.txt"))

        n_hosts = jax.process_count()
        host = jax.process_index()
        self.batcher = DynamicBatcher(
            self.train_ds.lengths, tcfg.max_num_tokens,
            num_buckets=tcfg.num_buckets, seed=tcfg.seed,
            num_hosts=n_hosts, host=host)
        if self.valid_ds is not None:
            self.valid_batcher = DynamicBatcher(
                self.valid_ds.lengths,
                tcfg.val_max_num_tokens or tcfg.max_num_tokens,
                num_buckets=tcfg.num_buckets, seed=tcfg.seed,
                num_hosts=n_hosts, host=host)

        self.total_step = tcfg.num_steps or 50000
        if tcfg.optimizer_name == "ScaledAdam":
            lr = eden_schedule(tcfg.lr, tcfg.reduce_lr_start_step,
                               tcfg.reduce_lr_start_epoch,
                               self.total_step * tcfg.warmup_fraction,
                               tcfg.pseudo_epoch_size)
            self.tx = scaled_adam(
                lr=lr, betas=(0.9, 0.95), clipping_scale=2.0,
                clipping_update_period=tcfg.clipping_update_period)
        else:
            lr = linear_warmup_decay(tcfg.lr, self.total_step,
                                     self.total_step * tcfg.warmup_fraction)
            self.tx = adamw_reference(lr, tcfg.weight_decay)
        self.lr_fn = lr

        self.params = init_params(mcfg, jax.random.PRNGKey(tcfg.seed))
        if init_from:
            from ..inference.loader import load_model
            _, loaded, _ = load_model(init_from)
            missing = {k: v for k, v in self.params.items() if k not in loaded}
            self.params = {**jax.tree.map(jnp.asarray, dict(loaded)),
                           **missing}
            if missing:
                log.info("init_from %s: fresh-initialised %s", init_from,
                         sorted(missing))
        opt_labels = None
        if train_mtp_only:
            assert "mtp_heads" in self.params, "train_mtp_only needs n_mtp>0"
            import optax
            opt_labels = {k: jax.tree.map(
                lambda _: "train" if k == "mtp_heads" else "freeze", v)
                for k, v in self.params.items()}
            self.tx = optax.multi_transform(
                {"train": self.tx, "freeze": optax.set_to_zero()}, opt_labels)
        param_sh = opt_sh = None
        if mesh is not None:
            from ..parallel.mesh import shard_params, param_shardings
            self.params = shard_params(self.params, mesh)
            param_sh = param_shardings(self.params, mesh)
        self.opt_state = jax.jit(self.tx.init)(self.params)
        if mesh is not None and tcfg.zero1:
            from ..parallel.mesh import zero1_opt_shardings
            opt_sh = zero1_opt_shardings(self.params, self.opt_state, mesh,
                                         labels=opt_labels)
            if opt_sh is not None:
                self.opt_state = jax.device_put(self.opt_state, opt_sh)
                log.info("ZeRO-1: optimizer moments sharded over data=%d",
                         mesh.shape["data"])
            elif mesh.shape["data"] > 1:
                log.warning(
                    "ZeRO-1 requested but the optimizer state layout is "
                    "unsupported (%s) — moments stay replicated per data "
                    "shard", type(self.opt_state).__name__)
        two_phase = tcfg.two_phase_step or (
            param_count(self.params) > 4e8 and len(jax.devices()) == 1)
        # the reference backprops loss/effective_ntoken for every optimizer
        # except ScaledAdam (steps/trainer.py:139-141)
        normalize = tcfg.optimizer_name != "ScaledAdam"
        if two_phase:
            from .step import make_train_step_two_phase
            log.info("using two-phase train step (memory-lean)")
            self.step_fn = make_train_step_two_phase(
                mcfg, self.tx, grad_accum=tcfg.gradient_accumulation_steps,
                normalize_loss=normalize,
                param_shardings=param_sh, opt_shardings=opt_sh)
        else:
            self.step_fn = make_train_step(
                mcfg, self.tx, grad_accum=tcfg.gradient_accumulation_steps,
                normalize_loss=normalize,
                param_shardings=param_sh, opt_shardings=opt_sh)
        self.rng = jax.random.PRNGKey(tcfg.seed)

        from ..utils.profiling import AverageMeter, StepProfiler
        self.meters = {k: AverageMeter(k) for k in ("data_time", "train_time")}
        self.profiler = StepProfiler(tcfg.profile_dir,
                                     start=tcfg.profile_start_step,
                                     stop=tcfg.profile_start_step + 3)

        self.progress = {"step": 1, "epoch": 0, "batch_in_epoch": 0,
                         "best_step": 1, "best_score": float("inf"),
                         "history": []}
        self.tb = tb_writer
        self.early_stop_accu = 0
        self._maybe_resume()
        log.info("model params: %d", param_count(self.params))

    # ---- checkpointing ---------------------------------------------------------

    def _ckpt_dir(self, tag: str) -> str:
        return os.path.join(os.path.abspath(self.tcfg.exp_dir), "ckpt_" + tag)

    def save(self, tag: str = "latest"):
        """Checkpoint to exp_dir.  In multi-process runs EVERY process must
        call this (orbax coordinates internally and the primary writes);
        guarding with process_index==0 deadlocks the save barrier.  The meta
        json + dir swap are primary-only."""
        import orbax.checkpoint as ocp
        path = self._ckpt_dir(tag)
        with ocp.StandardCheckpointer() as ckptr:
            # rng is a host-local single-device array — store as numpy (a
            # replicated host value) or multihost serialization rejects it
            ckptr.save(path + ".tmp_ocp",
                       {"params": self.params, "opt_state": self.opt_state,
                        "rng": np.asarray(self.rng)},
                       force=True)
        if jax.process_index() != 0:
            return
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        os.rename(path + ".tmp_ocp", path)
        meta = {"progress": self.progress,
                "model_config": asdict(self.mcfg),
                "train_config": asdict(self.tcfg)}
        with open(os.path.join(self.tcfg.exp_dir, f"meta_{tag}.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)

    def _maybe_resume(self):
        path = self._ckpt_dir("latest")
        meta_fn = os.path.join(self.tcfg.exp_dir, "meta_latest.json")
        if not (os.path.isdir(path) and os.path.exists(meta_fn)):
            return
        import orbax.checkpoint as ocp
        with open(meta_fn) as f:
            meta = json.load(f)
        with ocp.StandardCheckpointer() as ckptr:
            target = {"params": self.params, "opt_state": self.opt_state,
                      "rng": self.rng}
            restored = ckptr.restore(path, target)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.rng = jnp.asarray(restored["rng"], jnp.uint32)
        self.progress.update(meta["progress"])
        log.info("resumed from %s at step %d (epoch %d, batch %d)",
                 path, self.progress["step"], self.progress["epoch"],
                 self.progress["batch_in_epoch"])

    # ---- loops -----------------------------------------------------------------

    def _host_rng(self, epoch: int, batch_idx: int) -> np.random.Generator:
        return np.random.default_rng(
            (self.tcfg.seed, epoch, batch_idx, jax.process_index()))

    def _prefetch(self, epoch: int, batches, start_b: int, depth: int = 2):
        """Background collate: overlaps host-side load/compose with device
        steps (the reference used DataLoader worker processes for this,
        steps/trainer.py:332-367; here one thread + the native C++ reader
        suffice since composition is numpy)."""
        import queue as _q
        import threading
        q: "_q.Queue" = _q.Queue(maxsize=depth)

        def producer():
            try:
                for bi in range(start_b, len(batches)):
                    rng_host = self._host_rng(epoch, bi)
                    q.put((bi, collate_train(self.train_ds, batches[bi],
                                             rng_host)))
                q.put(None)
            except BaseException as e:      # noqa: BLE001
                # a dead producer must NOT leave the consumer blocked on
                # q.get() forever — surface the failure on the main thread
                q.put(("__error__", e))

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, tuple) and len(item) == 2 \
                    and item[0] == "__error__":
                raise RuntimeError("data producer thread failed") \
                    from item[1]
            yield item

    def train(self, max_steps: Optional[int] = None):
        t = self.tcfg
        total = min(self.total_step, max_steps or self.total_step)
        flag = True
        data_t0 = time.time()
        while flag:
            epoch = self.progress["epoch"]
            batches = self.batcher.epoch_batches(epoch)
            start_b = self.progress["batch_in_epoch"]
            for bi, batch in self._prefetch(epoch, batches, start_b):
                step = self.progress["step"]
                if step > total:
                    flag = False
                    break
                data_time = time.time() - data_t0
                distributed = jax.process_count() > 1
                if batch is None:
                    if not distributed:
                        self.progress["batch_in_epoch"] = bi + 1
                        continue
                    # multi-host: skipping only here would desync the hosts
                    # at the next collective — run a fully-masked dummy step
                    batch = self._empty_batch()
                gas = t.gradient_accumulation_steps
                if gas > 1 and batch.x.shape[0] % gas != 0:
                    batch = _pad_batch(batch, -(-batch.x.shape[0] // gas) * gas)
                if distributed:
                    # identical local shapes on every host (one GSPMD array)
                    B_t, Sx_t, Sy_t = self._fixed_dims()
                    if gas > 1:
                        B_t = -(-B_t // gas) * gas
                    batch = _pad_batch_full(batch, self.mcfg, B_t, Sx_t, Sy_t)
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch
                    batch = shard_batch(batch, self.mesh)
                self.profiler.step(step)
                self.rng, step_rng = jax.random.split(self.rng)
                t0 = time.time()
                self.params, self.opt_state, metrics = self.step_fn(
                    self.params, self.opt_state, batch, step_rng)
                metrics = jax.tree.map(np.asarray, metrics)
                train_time = time.time() - t0
                self.meters["data_time"].update(data_time)
                self.meters["train_time"].update(train_time)

                if metrics["is_nan"] > 0:
                    log.info("step %d: non-finite loss, batch skipped", step)
                ntok = max(float(metrics["effective_ntoken"]), 1.0)
                avg_loss = float(metrics["loss"]) / ntok
                if not np.isfinite(avg_loss) and metrics["is_nan"] == 0:
                    raise RuntimeError("training diverged (loss is NaN)")

                if step % t.tb_write_every_n_steps == 0 and self.tb:
                    self.tb.add_scalar("train/loss", avg_loss, step)
                    self.tb.add_scalar("train/lr", float(self.lr_fn(step)), step)
                    self.tb.add_scalar("train/top10acc",
                                       float(metrics["top10acc"]) / ntok, step)
                    # per-codebook accuracy, reference tag/normalization
                    # (steps/trainer.py:284-287: acc_cbi / ntoken * K,
                    # 1-indexed tags)
                    acc_cb = np.asarray(metrics["top10acc_by_codebook"])
                    for ci, a in enumerate(acc_cb):
                        self.tb.add_scalar(
                            f"train/top10acc_cb{ci + 1}",
                            float(a) * len(acc_cb) / ntok, step)
                    if "mtp_loss" in metrics:
                        self.tb.add_scalar("train/mtp_loss",
                                           float(metrics["mtp_loss"]) / ntok,
                                           step)
                        for gi, a in enumerate(
                                np.asarray(metrics["mtp_top1acc"])):
                            self.tb.add_scalar(
                                f"train/mtp_top1acc_g{gi + 1}", float(a),
                                step)
                if step % t.print_every_n_steps == 0:
                    log.info("step %d/%d epoch %d loss %.4f acc %.4f "
                             "lr %.2e data %.2fs step %.2fs",
                             step, total, epoch, avg_loss,
                             float(metrics["top10acc"]) / ntok,
                             float(self.lr_fn(step)), data_time, train_time)

                self.progress["step"] = step + 1
                self.progress["batch_in_epoch"] = bi + 1

                if step % t.val_every_n_steps == 0:
                    self.validate_and_save()
                    if self._should_early_stop():
                        log.info("early stop at step %d", step)
                        flag = False
                        break
                data_t0 = time.time()
            else:
                self.progress["epoch"] = epoch + 1
                self.progress["batch_in_epoch"] = 0
                continue
            break
        self.validate_and_save()

    def _fixed_dims(self):
        """Host-agnostic (B, Sx, Sy) caps for multi-host fixed-shape batches
        — derived from the (shared) dataset + config only, so every host
        computes the same values without communication."""
        if not hasattr(self, "_fixed_dims_cache"):
            m, t = self.mcfg, self.tcfg
            lens = list(self.train_ds.lengths)
            if self.valid_ds is not None:
                lens += list(self.valid_ds.lengths)
            ceil64 = lambda v: -(-int(v) // 64) * 64
            Sy = ceil64(max(lens) + 2 * m.max_n_spans + m.n_codebooks + 2)
            Sx = t.text_max_length if t.pad_x else -(-t.text_max_length // 16) * 16
            B = max(1, -(-t.max_num_tokens // max(min(lens), 1)) + 1)
            # the GLOBAL batch (B x process_count) must divide the mesh's
            # data axis -> per-host B must divide the local device count
            ld = max(jax.local_device_count(), 1)
            B = -(-B // ld) * ld
            self._fixed_dims_cache = (B, Sx, Sy)
        return self._fixed_dims_cache

    def _empty_batch(self):
        """A fully-masked batch with the fixed distributed dims."""
        from ..models.voicecraft import TrainBatch
        m = self.mcfg
        B, Sx, Sy = self._fixed_dims()
        K = m.n_codebooks
        return TrainBatch(
            x=jnp.full((B, Sx), m.text_pad_token, jnp.int32),
            x_lens=jnp.ones((B,), jnp.int32),
            y_tokens=jnp.full((B, K, Sy), m.audio_pad_token, jnp.int32),
            y_lens=jnp.ones((B,), jnp.int32),
            mask_emb_idx=jnp.full((B, Sy), -1, jnp.int32),
            target_valid=jnp.zeros((B, K, Sy), bool))

    def validate(self) -> float:
        if self.valid_ds is None:
            return float("nan")
        losses, ntoks, accs = [], [], []
        acc_cb = None
        batches = self.valid_batcher.epoch_batches(0)
        from ..models.voicecraft import forward_train
        eval_fn = jax.jit(lambda p, b: forward_train(p, self.mcfg, b,
                                                     rng=None, remat=False))
        distributed = jax.process_count() > 1
        for bi, idxs in enumerate(batches[:50]):
            rng_host = self._host_rng(10 ** 6, bi)
            batch = collate_train(self.valid_ds, idxs, rng_host)
            if batch is None:
                if not distributed:
                    continue
                batch = self._empty_batch()
            if distributed:
                batch = _pad_batch_full(batch, self.mcfg, *self._fixed_dims())
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch
                batch = shard_batch(batch, self.mesh)
            out = eval_fn(self.params, batch)
            losses.append(float(out["loss"]))
            ntoks.append(float(out["effective_ntoken"]))
            accs.append(float(out["top10acc"]))
            cb = np.asarray(out["top10acc_by_codebook"], np.float64)
            acc_cb = cb if acc_cb is None else acc_cb + cb
        if not ntoks:
            return float("nan")
        ntok = max(sum(ntoks), 1.0)
        score = sum(losses) / ntok
        if self.tb:
            step = self.progress["step"]
            self.tb.add_scalar("val/loss", score, step)
            self.tb.add_scalar("val/top10acc", sum(accs) / ntok, step)
            # reference steps/trainer.py:284-287 (1-indexed, x n_codebooks)
            for ci, a in enumerate(acc_cb):
                self.tb.add_scalar(f"val/top10acc_cb{ci + 1}",
                                   float(a) * len(acc_cb) / ntok, step)
        return score

    def validate_and_save(self):
        score = self.validate()
        step = self.progress["step"]
        self.progress["history"].append(
            [step, score, time.time() - self.start_time])
        # all processes enter save() — orbax coordinates the single write
        self.save("latest")
        if np.isfinite(score) and score < self.progress["best_score"]:
            self.progress["best_score"] = score
            self.progress["best_step"] = step
            self.save("best")
        if jax.process_index() == 0:
            log.info("validate: step %d score %.5f (best %.5f @ %d)",
                     step, score, self.progress["best_score"],
                     self.progress["best_step"])

    def _should_early_stop(self) -> bool:
        t = self.tcfg
        if t.early_stop_threshold <= 0:
            return False
        hist = self.progress["history"]
        if len(hist) < 2:
            return False
        prev_best = min(h[1] for h in hist[:-1] if np.isfinite(h[1])) \
            if any(np.isfinite(h[1]) for h in hist[:-1]) else float("inf")
        cur = hist[-1][1]
        if np.isfinite(cur) and prev_best - cur < t.early_stop_threshold:
            self.early_stop_accu += t.val_every_n_steps
        else:
            self.early_stop_accu = 0
        return self.early_stop_accu >= t.early_stop_step
