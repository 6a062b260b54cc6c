"""Training CLI — the fairseq_cli.train replacement.

Example (ASR pretrain, mirroring /root/reference/exp/1a-pretrain_asr.sh):

  python -m simulst_tpu.cli.train \
      --data DATA/en-de --model s2t_emformer --task asr \
      --loss joint_ctc --save-dir ckpt/asr \
      --override ctc_layer=true --loss-override ctc_factor=1.0

Tasks (reference tasks/speech_to_text_infer.py):
  asr  : targets = src_text (the --do-asr retarget, :95-108)
  st   : targets = tgt_text
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu import config as cfglib
from simulst_tpu.data.dataset import BatcherConfig, SpeechDataset, make_batches
from simulst_tpu.data.manifest import filter_by_frames, load_tsv
from simulst_tpu.data.vocab import Vocabulary
from simulst_tpu.losses.cif_loss import CIFLossConfig, cif_loss
from simulst_tpu.losses.joint_ctc import JointCTCConfig, joint_ctc_loss
from simulst_tpu.losses.mma_loss import MMALossConfig, mma_loss
from simulst_tpu.models import get_model
from simulst_tpu.ops.specaugment import spec_augment
from simulst_tpu.train.checkpoint import save_checkpoint
from simulst_tpu.train.loop import LoopConfig, Trainer
from simulst_tpu.train.mesh import make_mesh, shard_batch
from simulst_tpu.train.optim import OptimConfig


def build_loss(args, model):
    if args.loss == "ce":
        from simulst_tpu.losses.label_smoothed_ce import ce_loss

        def fn(params, batch, rng):
            logits, _ = model.forward(params, batch["src_tokens"],
                                      batch["prev_tokens"], rng=rng,
                                      deterministic=rng is None)
            loss, nll = ce_loss(logits, batch["target"], 0.1, 1)
            ntokens = (batch["target"] != 1).sum()
            return loss, {"loss": loss, "nll_loss": nll, "ntokens": ntokens,
                          "nsentences": batch["target"].shape[0],
                          "sample_size": ntokens}
    elif args.loss == "joint_ctc":
        lcfg = cfglib.apply_overrides(JointCTCConfig(), args.loss_overrides)

        def fn(params, batch, rng):
            plan = None
            if "pack_frame_gather" in batch:
                from simulst_tpu.train.packing import PackPlan
                plan = PackPlan(*[batch[f"pack_{f}"]
                                  for f in PackPlan._fields])
            logits, extra = model.forward(
                params, batch["feats"], batch["feat_lengths"],
                batch["prev_tokens"], rng=rng, deterministic=False,
                **({"pack_plan": plan} if plan is not None else {}))
            return joint_ctc_loss(logits, extra, batch["target"], lcfg,
                                  ctc_target=batch.get("src_target"))
    elif args.loss == "mma":
        lcfg = cfglib.apply_overrides(MMALossConfig(), args.loss_overrides)

        def fn(params, batch, rng):
            logits, extra = model.forward(
                params, batch["feats"], batch["feat_lengths"],
                batch["prev_tokens"], rng=rng, deterministic=False)
            return mma_loss(logits, extra, batch["target"],
                            batch["feat_lengths"], lcfg)
    elif args.loss == "cif":
        base = CIFLossConfig(cif_beta=model.cfg.cif_beta)
        lcfg = cfglib.apply_overrides(base, args.loss_overrides)

        def fn(params, batch, rng):
            logits, extra = model.forward(
                params, batch["feats"], batch["feat_lengths"],
                batch["prev_tokens"], rng=rng, deterministic=False)
            return cif_loss(logits, extra, batch["target"],
                            batch["feat_lengths"], lcfg)
    elif args.loss == "rnnt":
        from simulst_tpu.losses.rnnt_loss import RNNTLossConfig, rnnt_criterion
        lcfg = cfglib.apply_overrides(RNNTLossConfig(), args.loss_overrides)

        def fn(params, batch, rng):
            lattice, extra = model.forward(
                params, batch["feats"], batch["feat_lengths"],
                batch["prev_tokens"], rng=rng, deterministic=False)
            return rnnt_criterion(lattice, extra, lcfg)
    else:
        raise ValueError(args.loss)
    if args.specaugment:
        inner = fn

        def fn(params, batch, rng):  # noqa: F811
            # validation (rng None) and text batches skip augmentation
            if rng is None or "feats" not in batch:
                return inner(params, batch, rng)
            r1, r2 = jax.random.split(rng)
            batch = dict(batch, feats=spec_augment(
                r1, batch["feats"], batch["feat_lengths"]))
            return inner(params, batch, r2)
    return fn


def build_valid_fn(args, model, vocab, valid_ds, batches_fn, lcfg_loss_fn):
    """Validation = loss + optional inline greedy BLEU/WER (the reference's
    --inference-config-yaml path, tasks/speech_to_text_infer.py:126-217)."""
    def valid_fn(params):
        total, n = 0.0, 0.0
        refs, hyps = [], []
        for batch in batches_fn():
            ids = batch.pop("ids", None)
            n_real = batch.pop("n_real", None)
            batch.pop("indices", None)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            loss, metrics = lcfg_loss_fn(params, jb, None)
            total += float(metrics["loss"])
            n += float(metrics["sample_size"])
            if args.eval_metric != "none" and ids is not None \
                    and args.task != "mt":
                from simulst_tpu.cli.generate import decode_batch
                from simulst_tpu.decode.beam import BeamConfig
                import numpy as _np
                tokens, lengths = decode_batch(
                    model, params, batch,
                    BeamConfig(beam_size=args.eval_beam,
                               max_len=args.eval_max_len))
                tokens = _np.asarray(tokens)
                lengths = _np.asarray(lengths)
                tgt = _np.asarray(batch["target"])
                if n_real is None:          # no padding info: all rows real
                    n_real = tokens.shape[0]
                for j in range(n_real):
                    hyp_ids = [int(t) for t in tokens[j][: int(lengths[j])]
                               if t != 2]
                    ref_ids = [int(t) for t in tgt[j] if t not in (1, 2)]
                    hyps.append(vocab.decode_ids(hyp_ids))
                    refs.append(vocab.decode_ids(ref_ids))
        out = {"loss": total / max(n, 1.0)}
        if refs:
            from simulst_tpu.decode.scoring import corpus_bleu, wer
            if args.eval_metric == "bleu":
                out["bleu"] = corpus_bleu(refs, hyps)
            elif args.eval_metric == "wer":
                out["wer"] = wer(refs, hyps)
        return out
    return valid_fn


def main(argv=None):
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="dir with {split}_st.tsv + vocab")
    p.add_argument("--train-split", default="train")
    p.add_argument("--valid-split", default="dev")
    p.add_argument("--vocab", default=None, help="vocab .txt/.model path")
    p.add_argument("--model", default="s2t_emformer")
    p.add_argument("--task", default="st", choices=["asr", "st", "mt"])
    p.add_argument("--loss", default="joint_ctc",
                   choices=["joint_ctc", "mma", "cif", "rnnt", "ce"])
    p.add_argument("--save-dir", default="checkpoints")
    p.add_argument("--max-updates", type=int, default=100000)
    p.add_argument("--max-tokens", type=int, default=40000)
    p.add_argument("--update-freq", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup-updates", type=int, default=4000)
    p.add_argument("--clip-norm", type=float, default=10.0)
    p.add_argument("--patience", type=int, default=0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--cmvn", default="utterance",
                   choices=["utterance", "global", "none"],
                   help="feature normalization; 'global' reads gcmvn.npz "
                        "from the data dir (streaming-compatible)")
    p.add_argument("--mtl", action="store_true",
                   help="multi-task: CE on translations + CTC on transcripts "
                        "(--do-mtl parity)")
    p.add_argument("--specaugment", action="store_true", default=True)
    p.add_argument("--no-specaugment", dest="specaugment", action="store_false")
    p.add_argument("--pack", action="store_true",
                   help="sequence packing: run the Emformer stack over "
                        "segment-packed rows (train/packing.py) — less "
                        "zero-padding compute on bucketed batches; "
                        "s2t_emformer + joint_ctc, single data shard")
    p.add_argument("--load-params", default=None,
                   help="orbax checkpoint to init params from")
    p.add_argument("--resume", default=None,
                   help="checkpoint_resume path (params + optimizer + step)")
    p.add_argument("--load-pretrained-encoder-from", default=None)
    p.add_argument("--load-pretrained-decoder-from", default=None,
                   help="init decoder weights from a checkpoint "
                        "(reference mma_model.py:230-248)")
    p.add_argument("--encoder-freezing-updates", type=int, default=0,
                   help="zero encoder grads for the first N updates "
                        "(reference s2t_emformer.py:117-123)")
    p.add_argument("--override", action="append", default=[],
                   help="model config overrides key=value")
    p.add_argument("--loss-override", action="append", default=[])
    p.add_argument("--eval-metric", default="none",
                   choices=["none", "bleu", "wer"],
                   help="inline validation metric (inference-config parity)")
    p.add_argument("--eval-beam", type=int, default=1)
    p.add_argument("--eval-max-len", type=int, default=96)
    p.add_argument("--best-metric", default=None,
                   help="metric for best-checkpoint selection "
                        "(default: eval metric if set, else loss)")
    p.add_argument("--tensorboard", action="store_true",
                   help="also log scalars to <save-dir>/tb (reference "
                        "tensorboard dep, requirements.txt:10-11)")
    p.add_argument("--wandb-project", default=None,
                   help="wandb project (reference exp/1a-pretrain_asr.sh:29; "
                        "skipped if wandb is not installed)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax profiler trace of one post-warmup "
                        "train step to DIR")
    p.add_argument("--rng-impl", default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="PRNG implementation for dropout keys; rbg is "
                        "several x faster on TPU (threefry costs ~1/3 of "
                        "the whole train step at the 32x1024 geometry)")
    args = p.parse_args(argv)
    jax.config.update("jax_default_prng_impl", args.rng_impl)
    args.overrides = dict(cfglib.parse_override(s) for s in args.override)
    args.loss_overrides = dict(cfglib.parse_override(s) for s in args.loss_override)

    # vocab + data
    vocab_path = args.vocab
    if vocab_path is None:
        for cand in os.listdir(args.data):
            if cand.startswith("spm_") and cand.endswith(".txt"):
                vocab_path = os.path.join(args.data, cand)
                break
    vocab = (Vocabulary.from_spm(vocab_path) if vocab_path.endswith(".model")
             else Vocabulary.from_txt(vocab_path))

    target_field = "src_text" if args.task == "asr" else "tgt_text"
    bcfg = BatcherConfig(max_tokens=args.max_tokens, seed=args.seed,
                         cmvn=args.cmvn)
    global_stats = None
    if args.cmvn == "global":
        gpath = os.path.join(args.data, "gcmvn.npz")
        stats = np.load(gpath)
        global_stats = {"mean": stats["mean"], "std": stats["std"]}
    train_rows = load_tsv(
        os.path.join(args.data, f"{args.train_split}_st.tsv"))
    valid_rows = load_tsv(os.path.join(args.data, f"{args.valid_split}_st.tsv"))
    if args.task == "mt":
        from simulst_tpu.data.text_dataset import TextDataset, make_text_batches
        train_ds = TextDataset(train_rows, vocab)
        valid_ds = TextDataset(valid_rows, vocab)
        make_ds_batches = lambda ds, epoch=0, cfg=bcfg: make_text_batches(
            ds, dataclasses_replace(cfg, shuffle=ds is train_ds), epoch)
        args.specaugment = False
    else:
        train_rows = filter_by_frames(train_rows)
        mtl = args.mtl and args.task == "st"
        train_ds = SpeechDataset(train_rows, vocab, bcfg, target_field,
                                 global_stats=global_stats, mtl_src=mtl)
        valid_ds = SpeechDataset(valid_rows, vocab, dataclasses_replace(
            bcfg, shuffle=False), target_field, global_stats=global_stats,
            mtl_src=mtl)
        make_ds_batches = lambda ds, epoch=0: make_batches(ds, epoch=epoch)

    # model
    model_cls = get_model(args.model)
    mcfg = cfglib.apply_overrides(model_cls.Config(vocab_size=len(vocab)),
                                  args.overrides)
    model = model_cls(mcfg)
    params = model.init(jax.random.PRNGKey(args.seed))
    if args.load_params:
        from simulst_tpu.train.checkpoint import load_checkpoint
        params, _ = load_checkpoint(args.load_params, template=params)
    for comp, src in (("encoder", args.load_pretrained_encoder_from),
                      ("decoder", args.load_pretrained_decoder_from)):
        if src:
            from simulst_tpu.train.checkpoint import conform_tree, load_checkpoint
            pre, _ = load_checkpoint(src)
            params = dict(params,
                          **{comp: conform_tree(params[comp], pre[comp])})
            print(f"loaded pretrained {comp} from {src}")

    loss_fn = build_loss(args, model)
    optim_cfg = OptimConfig(lr=args.lr, warmup_updates=args.warmup_updates,
                            clip_norm=args.clip_norm)
    best_metric = args.best_metric or (
        args.eval_metric if args.eval_metric != "none" else "loss")
    loop_cfg = LoopConfig(max_updates=args.max_updates, patience=args.patience,
                          save_dir=args.save_dir, seed=args.seed,
                          best_metric=best_metric,
                          maximize_metric=best_metric == "bleu",
                          tensorboard=args.tensorboard,
                          wandb_project=args.wandb_project,
                          profile_dir=args.profile)
    freeze = ({"encoder": args.encoder_freezing_updates}
              if args.encoder_freezing_updates > 0 else None)
    trainer = Trainer(loss_fn, optim_cfg, loop_cfg, params,
                      valid_fn=build_valid_fn(
                          args, model, vocab, valid_ds,
                          lambda: make_ds_batches(valid_ds), loss_fn),
                      freeze_until=freeze, update_freq=args.update_freq,
                      metadata={"model": args.model,
                                "config": cfglib.to_dict(mcfg),
                                "cmvn": args.cmvn})
    if args.resume:
        start = trainer.resume(args.resume)
        print(f"resumed from {args.resume} at update {start}")

    mesh = make_mesh()
    if args.pack:
        assert args.model == "s2t_emformer" and args.loss == "joint_ctc", \
            "--pack currently supports s2t_emformer + joint_ctc"
        assert mesh.shape["data"] == 1, \
            "--pack with data parallelism needs per-shard plans (not wired)"

    pack_np_by_bucket = {}

    def attach_pack_plan(b):
        """Host-side pack plan for this batch (train/packing.py): segments
        of all examples bin-packed into rows; row count rounded up to a
        multiple of 4 so the jitted step compiles only per (bucket, R/4).
        The row length n_p is FIXED per frame bucket by its first batch —
        re-choosing it per batch would change every packed array's shape
        (Up = n_p*seg) and silently retrace the train step whenever FFD
        preferred a different row length for a batch's particular length
        mix."""
        from simulst_tpu.nn.conv import subsampler_out_lengths
        from simulst_tpu.train import packing
        l4 = np.asarray(subsampler_out_lengths(params["encoder"]["subsample"],
                                               b["feat_lengths"]))
        ecfg = mcfg.emformer
        n0 = b["feats"].shape[1] // mcfg.stride // ecfg.segment
        U4 = b["feats"].shape[1] // mcfg.stride
        n_p = pack_np_by_bucket.get(U4)
        if n_p is None:
            n_p = pack_np_by_bucket[U4] = packing.choose_row_segments(
                l4, ecfg.segment, packing.usable_row_segments(ecfg, n0,
                                                              4 * n0))
        plan = packing.pack_plan(l4, U4, ecfg.segment, ecfg.right_context,
                                 row_segs=n_p)
        r = plan.frame_gather.shape[0]
        if r % 4:
            plan = packing.pack_plan(l4, U4, ecfg.segment,
                                     ecfg.right_context,
                                     n_rows=r + 4 - r % 4, row_segs=n_p)
        for f in packing.PackPlan._fields:
            b[f"pack_{f}"] = getattr(plan, f)
        return b

    def batches(epoch):
        for b in make_ds_batches(train_ds, epoch=epoch):
            b.pop("ids", None); b.pop("n_real", None); b.pop("indices", None)
            if args.pack:
                b = attach_pack_plan(b)
            yield shard_batch(mesh, {k: jnp.asarray(v) for k, v in b.items()})

    state = trainer.fit(batches)
    save_checkpoint(os.path.join(args.save_dir, "checkpoint_last"),
                    state.params, metadata={
                        "model": args.model,
                        "config": cfglib.to_dict(mcfg),
                        "cmvn": args.cmvn,
                        "step": int(state.step)})
    return state


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


if __name__ == "__main__":
    main()
