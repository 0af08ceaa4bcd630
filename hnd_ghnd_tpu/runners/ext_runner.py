"""Neural-filter ("ext") training entry point.

Parity surface: src/ext_runner.py — trains the 2-class filter that sits on
the bottleneck encoder of a frozen detector: labels are "does this image
contain a valid target" (check_if_valid_target, src/models/ext/backbone.py:
19-34), loss is cross-entropy (:55), model selection is ROC-AUC (:146-150),
and the final report is a threshold/TPR/FPR table at --min_recall (:112-119).
"""
from __future__ import annotations

import argparse
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hnd_ghnd_tpu.core.config import load_config, overwrite_config
from hnd_ghnd_tpu.data.coco import check_if_valid_target
from hnd_ghnd_tpu.models.factory import get_model
from hnd_ghnd_tpu.parallel import multihost
from hnd_ghnd_tpu.parallel.mesh import (build_optimizer, make_mesh,
                                        make_mesh_for_batch, put_batch,
                                        replicate)
from hnd_ghnd_tpu.runners import common
from hnd_ghnd_tpu.utils import ckpt as ckpt_util
from hnd_ghnd_tpu.utils.logging import MetricLogger
from hnd_ghnd_tpu.utils.params import apply_grad_mask

EXT_PATH = ("backbone", "body", "layer1", "ext_classifier")


def get_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Ext (neural filter) runner")
    common.add_common_args(parser)
    parser.add_argument("-train", action="store_true")
    parser.add_argument("-test_only", action="store_true")
    parser.add_argument("--min_recall", type=float, default=0.98)
    parser.add_argument("--profile_dir", default=None,
                        help="capture an XLA profiler trace of the first "
                             "training steps into this directory")
    parser.add_argument("--tb_dir", default=None,
                        help="write TensorBoard scalar curves (CE loss per "
                             "log interval; val accuracy/recall/ROC-AUC per "
                             "epoch) into this directory")
    return parser


def host_target_to_ext_label(target: Dict, keypoint_task: bool) -> int:
    """convert_target2ext_targets analog (src/ext_runner.py:34-36) on the
    loader's host target dicts."""
    anns = []
    boxes = target.get("boxes", np.zeros((0, 4)))
    for i in range(len(boxes)):
        ann = {"bbox": [float(boxes[i, 0]), float(boxes[i, 1]),
                        float(boxes[i, 2] - boxes[i, 0]),
                        float(boxes[i, 3] - boxes[i, 1])]}
        if "keypoints" in target:
            ann["keypoints"] = np.asarray(target["keypoints"][i]).reshape(-1).tolist()
        anns.append(ann)
    return int(check_if_valid_target(anns, keypoint_task=keypoint_task))


def _ext_only_mask(params):
    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return path[:len(EXT_PATH)] == EXT_PATH
    return walk(params, ())


def make_ext_train_step(model, optimizer, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def step(params, state, opt_state, images, labels):
        mask = _ext_only_mask(params)

        def loss_fn(p):
            logits, new_state, _ = model.forward(
                p, state, {"images": images,
                           "image_sizes": jnp.zeros((images.shape[0], 2), jnp.int32),
                           "original_sizes": jnp.zeros((images.shape[0], 2), jnp.int32)},
                training=True, ext_training=True)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
            return ce, new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = apply_grad_mask(grads, mask)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return loss, new_params, new_state, new_opt_state

    return jax.jit(step, in_shardings=(repl, repl, repl, data, data),
                   out_shardings=(repl, repl, repl, repl))


def collect_probs(model, params, state, loader, keypoint_task: bool,
                  jits: Dict = None):
    """Eval pass: per-image filter probability P(valid) + label.

    ``jits``: pass a runner-scope dict to reuse compiled forwards across
    epochs (per-shape cache)."""
    if jits is None:
        jits = {}
    probs: List[float] = []
    labels: List[int] = []
    for batch, _, host_targets in loader:
        shape = batch["images"].shape
        if shape not in jits:
            @jax.jit
            def fwd(p, s, im):
                logits, _, _ = model.forward(
                    p, s, {"images": im,
                           "image_sizes": jnp.zeros((im.shape[0], 2), jnp.int32),
                           "original_sizes": jnp.zeros((im.shape[0], 2), jnp.int32)},
                    training=False, ext_training=True)
                return logits
            jits[shape] = fwd
        pr = np.asarray(jits[shape](params, state,
                                    jnp.asarray(batch["images"])))
        for i, tgt in enumerate(host_targets):
            if tgt.get("is_padding"):
                continue
            probs.append(float(pr[i, 1]))
            labels.append(host_target_to_ext_label(tgt, keypoint_task))
    probs_np, labels_np = np.asarray(probs), np.asarray(labels)
    # multi-process: each process scored only its eval shard — merge so
    # ROC-AUC (and the best-ckpt gating it drives) agrees on every process,
    # matching the reference where every rank evaluates the full val set
    if multihost.get_world_size() > 1:
        gathered = multihost.all_gather_objects((probs_np, labels_np))
        probs_np = np.concatenate([g[0] for g in gathered])
        labels_np = np.concatenate([g[1] for g in gathered])
    return probs_np, labels_np


def summarize_cls(probs, labels, threshold=0.5):
    from sklearn import metrics
    preds = (probs >= threshold).astype(int)
    acc = float((preds == labels).mean())
    tp = int(((preds == 1) & (labels == 1)).sum())
    tn = int(((preds == 0) & (labels == 0)).sum())
    fp = int(((preds == 1) & (labels == 0)).sum())
    fn = int(((preds == 0) & (labels == 1)).sum())
    recall = tp / max(tp + fn, 1)
    specificity = tn / max(tn + fp, 1)
    try:
        auc = float(metrics.roc_auc_score(labels, probs))
    except ValueError:
        auc = float("nan")
    print(f"accuracy: {acc:.4f} recall: {recall:.4f} "
          f"specificity: {specificity:.4f} ROC-AUC: {auc:.4f}")
    return acc, recall, specificity, auc


def print_threshold_table(probs, labels, min_recall: float):
    """The reference's threshold/TPR/FPR report (src/ext_runner.py:112-119)."""
    from sklearn import metrics
    try:
        fpr, tpr, thr = metrics.roc_curve(labels, probs)
    except ValueError:
        print("single-class labels; no ROC curve")
        return
    import pandas as pd
    df = pd.DataFrame({"threshold": thr, "tpr": tpr, "fpr": fpr})
    ok = df[df.tpr >= min_recall]
    print(f"operating points with recall >= {min_recall}:")
    print((ok if len(ok) else df).to_string(index=False))


def main(args):
    config = overwrite_config(load_config(args.config), args.json)
    common.enable_persistent_compilation_cache()
    distributed = multihost.maybe_init_distributed(args)
    devices = jax.devices()
    if args.world_size and not distributed:
        devices = devices[:args.world_size]
    global_batch = int(config["train"]["batch_size"]) * jax.process_count()
    mesh = make_mesh_for_batch(global_batch, devices)
    model, params, state = get_model(config["model"], seed=args.seed)
    assert model.bottleneck is not None and model.bottleneck.ext is not None, \
        "ext_runner requires a bottleneck model with ext_config"
    keypoint_task = model.kind == "keypoint_rcnn"
    ckpt_path = (config["model"]["backbone"].get("ext_config", {}) or {}).get("ckpt")

    train_cfg = config["train"]
    train_loader, val_loader, test_loader = common.loaders_from_config(
        config, model.kind, int(train_cfg["batch_size"]))
    eval_jits: Dict = {}

    if args.train:
        from hnd_ghnd_tpu.utils.tensorboard import SummaryWriter
        optimizer, _ = build_optimizer(train_cfg["optimizer"],
                                       train_cfg.get("scheduler"),
                                       max(len(train_loader), 1))
        step = make_ext_train_step(model, optimizer, mesh)
        opt_state = optimizer.init(params)
        best_auc = 0.0
        # resume like the reference (ext_runner.py:131-134: best ROC-AUC +
        # classifier + optimizer + scheduler restored from the ext ckpt)
        if ckpt_util.check_if_exists(ckpt_path):
            payload = ckpt_util.load_ckpt(ckpt_path)
            params = payload["params"]
            state = payload["state"] or state
            if payload.get("opt_state") is not None:
                opt_state = payload["opt_state"]
            best_auc = payload.get("best_value", 0.0)
            print(f"resumed ext training from {ckpt_path} "
                  f"(best ROC-AUC {best_auc:.4f})")
        params_r, state_r, opt_r = (replicate(x, mesh)
                                    for x in (params, state, opt_state))
        log_freq = int(train_cfg.get("log_freq", 1000))
        tb = SummaryWriter(getattr(args, "tb_dir", None)
                           if multihost.is_main_process() else None)
        profile_dir = getattr(args, "profile_dir", None)
        profile_steps = 0
        global_step = 0

        def log_entry(logger, entry):
            if entry is None:
                return
            idx, loss_val, _ = entry
            logger.update(loss=loss_val)
            if idx % log_freq == 0:
                tb.add_scalar("train/loss", loss_val, idx)

        for epoch in range(int(train_cfg["num_epochs"])):
            train_loader.set_epoch(epoch)
            logger = MetricLogger()
            # delayed-fetch loss reads (common.StepMetrics): no per-step
            # blocking D2H in the hot loop
            metrics = common.StepMetrics()
            for batch, _, host in logger.log_every(
                    train_loader, log_freq, f"Epoch: [{epoch}]"):
                labels = jnp.asarray([host_target_to_ext_label(t, keypoint_task)
                                      for t in host], jnp.int32)
                if profile_dir and profile_steps == 2:  # skip compile steps
                    jax.profiler.start_trace(profile_dir)
                loss, params_r, state_r, opt_r = step(
                    params_r, state_r, opt_r,
                    jax.device_put(jnp.asarray(batch["images"]),
                                   jax.sharding.NamedSharding(
                                       mesh, jax.sharding.PartitionSpec("data"))),
                    jax.device_put(labels, jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec("data"))))
                global_step += 1
                for entry in metrics.push(global_step, loss, {}):
                    log_entry(logger, entry)
                if profile_dir:
                    profile_steps += 1
                    if profile_steps == 6:
                        jax.profiler.stop_trace()
                        print(f"profiler trace written to {profile_dir}")
                        profile_dir = None
            for entry in metrics.drain():
                log_entry(logger, entry)
            probs, labels = collect_probs(model, params_r, state_r,
                                          val_loader, keypoint_task,
                                          jits=eval_jits)
            acc, recall, _, auc = summarize_cls(probs, labels)
            tb.add_scalar("val/accuracy", acc, epoch)
            tb.add_scalar("val/recall", recall, epoch)
            if auc == auc:  # skip NaN (single-class val shard)
                tb.add_scalar("val/roc_auc", auc, epoch)
            tb.flush()
            if auc > best_auc and ckpt_path:
                best_auc = auc
                multihost.save_on_master(
                    ckpt_util.save_ckpt, ckpt_path, params=params_r,
                    state=state_r, opt_state=opt_r, best_value=best_auc,
                    config=config, args=vars(args))
        tb.close()
        params, state = params_r, state_r
    # the test threshold table always runs the BEST classifier, including
    # right after training (reference ext_runner.py:191 reloads the
    # best-ROC-AUC ckpt before the test evaluate)
    if ckpt_util.check_if_exists(ckpt_path):
        payload = ckpt_util.load_ckpt(ckpt_path)
        params = payload["params"]
        state = payload["state"] or state

    probs, labels = collect_probs(model, params, state, test_loader,
                                  keypoint_task, jits=eval_jits)
    summarize_cls(probs, labels)
    print_threshold_table(probs, labels, args.min_recall)


def cli():
    main(get_argparser().parse_args())


if __name__ == "__main__":
    cli()
