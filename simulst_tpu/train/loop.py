"""Training loop: the native replacement for fairseq_cli.train.

Owns what the reference inherits from fairseq (SURVEY.md §1 "control
inversion"): epoch iteration, jitted step dispatch per bucket shape,
validation with inline greedy BLEU/WER (the reference's
--inference-config-yaml path, tasks/speech_to_text_infer.py:126-144),
best-metric checkpointing with metric-encoded filenames, patience early
stopping, jsonl logging.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu.train.checkpoint import save_checkpoint
from simulst_tpu.train.optim import OptimConfig
from simulst_tpu.train.state import TrainState, create_train_state, make_train_step


@dataclasses.dataclass
class LoopConfig:
    max_updates: int = 100000
    max_epochs: int = 1000
    log_interval: int = 100
    validate_interval_updates: int = 1000
    keep_best: int = 5
    best_metric: str = "loss"     # "loss" | "wer" | "bleu"
    maximize_metric: bool = False
    patience: int = 0
    save_dir: str = "checkpoints"
    seed: int = 1
    # observability (the reference's --wandb-project / tensorboard deps,
    # exp/1a-pretrain_asr.sh:29, requirements.txt:10-11); both optional and
    # silently skipped when the package is absent
    tensorboard: bool = False
    wandb_project: Optional[str] = None
    # write a jax profiler trace of one post-warmup train step here
    profile_dir: Optional[str] = None


# criterion metrics accumulated as per-sentence sums (normalized by
# nsentences at log time, matching the reference's reduce_metrics,
# e.g. joint_ctc_criterion.py:195-199); everything else unrecognized is
# treated as a sample_size-normalized loss term.
_PER_SENTENCE = {"blank_rate", "ctc_recall", "ctc_precision"}
_RAW = {"loss", "gnorm", "skipped", "sample_size", "ntokens", "nsentences"}


def summarize_metrics(metrics: Dict) -> Dict[str, float]:
    """Turn a summed metrics dict into a normalized log record: losses per
    sample_size, nll per token, per-sentence stats per sentence, plus
    derived CTC F1 (reference joint_ctc_criterion.py:201-214)."""
    m = {k: float(v) for k, v in metrics.items()}
    denom = max(m.get("sample_size", 1.0), 1.0)
    nsent = max(m.get("nsentences", 1.0), 1.0)
    out = {}
    for k, v in m.items():
        if k in _RAW:
            continue
        elif k == "nll_loss":
            out[k] = v / max(m.get("ntokens", denom), 1.0)
        elif k in _PER_SENTENCE:
            out[k] = v / nsent
        else:
            out[k] = v / denom
    r, p = out.get("ctc_recall"), out.get("ctc_precision")
    if r is not None and p is not None:
        out["ctc_f1"] = round(2 * p * r / (p + r), 3) if (p + r) > 0 else 0.0
    return out


def _make_sinks(cfg: LoopConfig):
    """Extra metric sinks behind the jsonl log: tensorboard and/or wandb."""
    sinks = []
    if cfg.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(os.path.join(cfg.save_dir, "tb"))

            def tb_sink(record):
                step = int(record.get("update",
                                      record.get("valid_update", 0)))
                for k, v in record.items():
                    if isinstance(v, (int, float)) and k not in (
                            "update", "valid_update", "epoch"):
                        writer.add_scalar(k, v, step)
                writer.flush()
            sinks.append(tb_sink)
        except ImportError:
            print("tensorboard unavailable; skipping sink")
    if cfg.wandb_project:
        try:
            import wandb
            wandb.init(project=cfg.wandb_project, dir=cfg.save_dir,
                       resume="allow")
            sinks.append(lambda record: wandb.log(record))
        except ImportError:
            print("wandb unavailable; skipping sink")
    return sinks


class Trainer:
    def __init__(self, loss_fn: Callable, optim_cfg: OptimConfig,
                 loop_cfg: LoopConfig, params,
                 valid_fn: Optional[Callable] = None,
                 freeze_until: Optional[Dict[str, int]] = None,
                 update_freq: int = 1,
                 metadata: Optional[Dict] = None):
        """loss_fn(params, batch, rng) -> (loss, metrics);
        valid_fn(params) -> dict of metrics (must include loop best_metric).
        metadata (e.g. model name + config) is stamped into EVERY checkpoint
        so best/averaged checkpoints reconstruct the right model."""
        self.loop_cfg = loop_cfg
        self.update_freq = update_freq
        self.metadata = dict(metadata or {})
        self.state = create_train_state(params, optim_cfg)
        if update_freq > 1:
            from simulst_tpu.train.state import make_accum_train_step
            self.grad_step, self.apply_step = make_accum_train_step(
                loss_fn, optim_cfg, freeze_until)
            self.train_step = None
        else:
            # donate the TrainState: params + adam moments update in place
            self.train_step = jax.jit(
                make_train_step(loss_fn, optim_cfg, freeze_until=freeze_until),
                donate_argnums=(0,))
        self.valid_fn = valid_fn
        self.best = None
        self.bad_epochs = 0
        os.makedirs(loop_cfg.save_dir, exist_ok=True)
        self.log_path = os.path.join(loop_cfg.save_dir, "train_log.jsonl")
        self.sinks = _make_sinks(loop_cfg)

    def log(self, record: Dict):
        record = {k: (float(v) if hasattr(v, "item") or
                      isinstance(v, (np.floating, np.integer)) else v)
                  for k, v in record.items()}
        with open(self.log_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        print(json.dumps(record), flush=True)
        for sink in self.sinks:
            sink(record)

    def _maybe_save_best(self, metrics: Dict[str, float],
                         count_patience: bool = False):
        cfg = self.loop_cfg
        value = metrics.get(cfg.best_metric)
        if value is None:
            return
        better = (self.best is None or
                  (value > self.best if cfg.maximize_metric else value < self.best))
        name = f"checkpoint.best_{cfg.best_metric}_{value:.4f}"
        save_checkpoint(os.path.join(cfg.save_dir, name), self.state.params,
                        metadata={**self.metadata,
                                  "step": int(self.state.step)})
        if better:
            self.best = value
            self.bad_epochs = 0
        elif count_patience:
            # fairseq --patience counts EPOCH-end validations without
            # improvement (validate-interval defaults to one epoch); mid-epoch
            # interval validations checkpoint but don't burn patience
            self.bad_epochs += 1
        # prune beyond keep_best
        from simulst_tpu.train.checkpoint import find_best_checkpoints
        keep = set(find_best_checkpoints(cfg.save_dir, cfg.keep_best,
                                         cfg.maximize_metric))
        import re, shutil
        for f in os.listdir(cfg.save_dir):
            p = os.path.join(cfg.save_dir, f)
            if re.match(r"checkpoint\.best_", f) and p not in keep \
                    and os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)

    def fit(self, batch_iter_fn: Callable[[int], Iterable[Dict]]):
        """batch_iter_fn(epoch) -> iterator of device-ready batches."""
        cfg = self.loop_cfg
        rng = jax.random.PRNGKey(cfg.seed)
        t0 = time.time()
        updates = int(self.state.step)   # nonzero after resume()
        profile_at = updates + 5 if cfg.profile_dir else -1
        accum_grads, accum_metrics, n_accum = None, None, 0

        def run_step(fn, *a):
            # one post-warmup step under the jax profiler (--profile)
            if updates == profile_at:
                with jax.profiler.trace(cfg.profile_dir):
                    out = fn(*a)
                    jax.block_until_ready(out)
                self.log({"profile_trace": cfg.profile_dir,
                          "update": updates})
                return out
            return fn(*a)
        for epoch in range(cfg.max_epochs):
            for batch in batch_iter_fn(epoch):
                rng, sub = jax.random.split(rng)
                ids = batch.pop("ids", None)
                batch.pop("n_real", None)
                if self.update_freq > 1:
                    grads, metrics = self.grad_step(self.state.params,
                                                    batch, sub)
                    if accum_grads is None:
                        accum_grads, accum_metrics = grads, metrics
                    else:
                        accum_grads = jax.tree.map(jnp.add, accum_grads, grads)
                        accum_metrics = jax.tree.map(jnp.add, accum_metrics,
                                                     metrics)
                    n_accum += 1
                    if n_accum < self.update_freq:
                        continue
                    self.state, metrics = run_step(
                        self.apply_step, self.state, accum_grads,
                        accum_metrics)
                    accum_grads, accum_metrics, n_accum = None, None, 0
                else:
                    self.state, metrics = run_step(self.train_step,
                                                   self.state, batch, sub)
                updates += 1
                if updates % cfg.log_interval == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    denom = max(m.get("sample_size", 1.0), 1.0)
                    rec = {"epoch": epoch, "update": updates,
                           "loss": m["loss"] / denom,
                           "gnorm": m.get("gnorm", 0.0),
                           "ups": updates / (time.time() - t0),
                           **summarize_metrics(metrics)}
                    if m.get("skipped"):
                        rec["skipped"] = m["skipped"]
                    self.log(rec)
                if updates % cfg.validate_interval_updates == 0:
                    self.validate(updates)
                if updates >= cfg.max_updates:
                    self.validate(updates)
                    return self.state
            # end of epoch: the patience-counting validation (fairseq
            # validates per epoch; --patience 25 == 25 epochs)
            self.validate(updates, count_patience=True)
            if cfg.patience and self.bad_epochs >= cfg.patience:
                self.log({"early_stop": updates, "epoch": epoch})
                return self.state
        return self.state

    def validate(self, updates: int, count_patience: bool = False):
        self.save_last()
        if self.valid_fn is None:
            return
        metrics = self.valid_fn(self.state.params)
        self.log({"valid_update": updates, **metrics})
        self._maybe_save_best(metrics, count_patience=count_patience)

    def save_last(self):
        """Full resumable state (params + optimizer + step), the fairseq
        checkpoint_last equivalent."""
        save_checkpoint(os.path.join(self.loop_cfg.save_dir, "checkpoint_resume"),
                        {"params": self.state.params,
                         "opt_state": self.state.opt_state,
                         "step": self.state.step},
                        metadata=self.metadata)

    def resume(self, path: str):
        from simulst_tpu.train.checkpoint import load_checkpoint
        template = {"params": self.state.params,
                    "opt_state": self.state.opt_state,
                    "step": self.state.step}
        restored, _ = load_checkpoint(path, template=template)
        from simulst_tpu.train.state import TrainState
        self.state = TrainState(params=restored["params"],
                                opt_state=restored["opt_state"],
                                step=restored["step"])
        return int(restored["step"])
