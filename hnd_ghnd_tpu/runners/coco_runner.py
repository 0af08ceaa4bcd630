"""Supervised detector training entry point (produces 'org' teachers).

Parity surface: src/coco_runner.py — config-driven detector training with
loss = sum of the R-CNN loss dict, per-epoch eval, best-mAP checkpointing,
NaN-loss abort (:51-54).  The reference's double lr_scheduler.step() per
epoch (:84, :94) is a quirk we do NOT reproduce: milestones advance once
per epoch here.
"""
from __future__ import annotations

import argparse
import math
import sys

import jax

from hnd_ghnd_tpu.core.config import load_config, overwrite_config
from hnd_ghnd_tpu.models.factory import get_model
from hnd_ghnd_tpu.parallel import multihost
from hnd_ghnd_tpu.parallel.mesh import (build_optimizer, make_mesh,
                                        make_mesh_for_batch,
                                        make_detection_train_step, put_batch,
                                        replicate)
from hnd_ghnd_tpu.runners import common
from hnd_ghnd_tpu.utils import ckpt as ckpt_util
from hnd_ghnd_tpu.utils.logging import MetricLogger
from hnd_ghnd_tpu.utils.tensorboard import SummaryWriter


def get_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="COCO detector trainer")
    common.add_common_args(parser)
    parser.add_argument("-train", action="store_true")
    parser.add_argument("-test_only", action="store_true")
    parser.add_argument("--tb_dir", default=None,
                        help="write TensorBoard scalar curves")
    return parser


def train(model, params, state, config, args, mesh, eval_jits=None):
    train_cfg = config["train"]
    model_cfg = config["model"]
    min_sizes = common.keypoint_min_sizes(model.kind, True)
    train_loader, val_loader, _ = common.loaders_from_config(
        config, model.kind, int(train_cfg["batch_size"]),
        min_sizes=min_sizes)

    steps_per_epoch = max(len(train_loader), 1)
    warmup = min(1000, steps_per_epoch - 1)
    optimizer, _ = build_optimizer(train_cfg["optimizer"],
                                   train_cfg.get("scheduler"),
                                   steps_per_epoch, warmup)
    frozen = model_cfg.get("frozen_modules", [])
    if (model_cfg["backbone"].get("params", {}) or {}).get("freeze_layers"):
        # reference freeze_layers: everything in the trunk except layer2-4
        # (src/models/org/rcnn.py:399-404)
        frozen = list(frozen) + ["backbone.body.conv1", "backbone.body.bn1",
                                 "backbone.body.layer1"]
    compute_dtype = common.compute_dtype_from_config(config)
    # tpu.steps_per_dispatch: N optimizer steps per host dispatch via an
    # in-jit lax.scan (see mesh.make_distill_train_step); targets stack
    # cleanly because the loader pads to a static MAX_GT
    tpu_cfg = config.get("tpu", {}) or {}
    spd = max(int(tpu_cfg.get("steps_per_dispatch", 1)), 1)
    step = make_detection_train_step(
        model, optimizer, frozen, mesh=mesh,
        compute_dtype=compute_dtype, steps_per_dispatch=spd,
        dispatch_unroll=max(int(tpu_cfg.get("dispatch_unroll", 1)), 1))
    step1 = step if spd == 1 else make_detection_train_step(
        model, optimizer, frozen, mesh=mesh, compute_dtype=compute_dtype)

    opt_state = optimizer.init(params)
    best_val_map = 0.0
    ckpt_path = model_cfg.get("ckpt")
    if ckpt_util.check_if_exists(ckpt_path):
        payload = ckpt_util.load_ckpt(ckpt_path)
        params = payload["params"]
        state = payload["state"] or state
        if payload.get("opt_state") is not None:
            # the reference restores the optimizer + scheduler on resume
            # (models/__init__.py:20-35); the schedule step rides in
            # opt_state's count
            opt_state = payload["opt_state"]
        best_val_map = payload.get("best_value", 0.0)
        print(f"resumed from {ckpt_path}")

    params, state, opt_state = (replicate(x, mesh)
                                for x in (params, state, opt_state))
    rng = jax.random.PRNGKey(args.seed)
    tb = SummaryWriter(getattr(args, "tb_dir", None)
                       if multihost.is_main_process() else None)
    global_step = 0
    log_freq = int(train_cfg.get("log_freq", 1000))

    def log_entry(logger, entry):
        # delayed-fetch read of a step's scalars (common.StepMetrics); the
        # NaN-loss hard abort (reference coco_runner.py:51-54) fires here,
        # within StepMetrics.lag steps of the bad update
        idx, loss_val, terms = entry
        if not math.isfinite(loss_val):
            print(f"Loss is {loss_val}, stopping training")
            print(terms)
            sys.exit(1)
        logger.update(loss=loss_val, **terms)
        if idx % log_freq == 0:
            tb.add_scalar("train/loss", loss_val, idx)
            for k, v in terms.items():
                tb.add_scalar(f"train/{k}", v, idx)

    def dispatch(fn, b, tg, keys, batch_dim):
        nonlocal params, state, opt_state
        loss, loss_dict, params, state, opt_state = fn(
            params, state, opt_state,
            put_batch(b, mesh, batch_dim), put_batch(tg, mesh, batch_dim),
            keys)
        return loss, loss_dict

    for epoch in range(int(train_cfg["num_epochs"])):
        train_loader.set_epoch(epoch)
        logger = MetricLogger()
        metrics = common.StepMetrics()
        # per-BUCKET microbatch buffering (spd > 1): consecutive loader
        # batches can come from different aspect-ratio buckets whose padded
        # shapes differ and can never stack into one dispatch
        micro = common.MicrobatchBuffer(spd)
        for batch, targets, _ in logger.log_every(
                train_loader, log_freq, f"Epoch: [{epoch}]"):
            rng, key = jax.random.split(rng)
            if spd > 1:
                payload = micro.add(batch, targets, key)
                if payload is None:
                    continue
                sb, st, keys = payload
                loss, loss_dict = dispatch(step, sb, st, keys, 1)
                global_step += spd
            else:
                loss, loss_dict = dispatch(step1, batch, targets, key, 0)
                global_step += 1
            for entry in metrics.push(global_step, loss, loss_dict):
                log_entry(logger, entry)
        # epoch-end remainder (per-bucket leftovers): plain single steps
        for b, tg, key in micro.drain():
            loss, loss_dict = dispatch(step1, b, tg, key, 0)
            global_step += 1
            for entry in metrics.push(global_step, loss, loss_dict):
                log_entry(logger, entry)
        for entry in metrics.drain():
            log_entry(logger, entry)

        coco_evaluator = common.evaluate(
            model, params, state, val_loader,
            mesh=common.eval_mesh_for(val_loader, mesh), jits=eval_jits)
        val_map = float(coco_evaluator.stats["bbox"][0])
        tb.add_scalar("val/map", val_map, epoch)
        tb.flush()
        if val_map > best_val_map and ckpt_path:
            best_val_map = val_map
            multihost.save_on_master(
                ckpt_util.save_ckpt, ckpt_path, params=params, state=state,
                opt_state=opt_state, best_value=best_val_map,
                config=config, args=vars(args),
                backend=(config.get("train", {}) or {}).get(
                    "ckpt_backend", "pickle"))
    tb.close()
    multihost.barrier("coco_train_end")
    return params, state


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
    eval_jits = common.JitCache(model)
    if args.train:
        params, state = train(model, params, state, config, args, mesh,
                              eval_jits=eval_jits)
    elif ckpt_util.check_if_exists(config["model"].get("ckpt")):
        payload = ckpt_util.load_ckpt(config["model"]["ckpt"])
        params = payload["params"]
        state = payload["state"] or state

    _, _, test_loader = common.loaders_from_config(config, model.kind, 1)
    common.evaluate(model, params, state, test_loader,
                    mesh=common.eval_mesh_for(test_loader, mesh),
                    jits=eval_jits)


def cli():
    main(get_argparser().parse_args())


if __name__ == "__main__":
    cli()
