"""HND / GHND distillation entry point.

Parity surface: src/mimic_runner.py — builds a frozen teacher and a
bottleneck student from the YAML config, runs distillation epochs over the
data mesh, evaluates val bbox mAP per epoch, keeps the best checkpoint, and
finally evaluates teacher and student on the test split.

CLI mirrors the reference: --config, --json, -distill, -test_only,
-student_only, -transform_bottleneck, -skip_teacher_eval; --world_size maps
to mesh size (DDP process-group flags have no analog).
"""
from __future__ import annotations

import argparse

import jax

from hnd_ghnd_tpu.core.config import load_config, overwrite_config
from hnd_ghnd_tpu.distill.box import DistillationBox
from hnd_ghnd_tpu.models.factory import get_model
from hnd_ghnd_tpu.parallel import multihost
from hnd_ghnd_tpu.parallel.mesh import (build_optimizer, make_mesh,
                                        make_mesh_for_batch,
                                        make_distill_train_step, put_batch,
                                        replicate)
from hnd_ghnd_tpu.runners import common
from hnd_ghnd_tpu.utils import ckpt as ckpt_util
from hnd_ghnd_tpu.utils.logging import MetricLogger
from hnd_ghnd_tpu.utils.tensorboard import SummaryWriter


def get_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Mimic (distillation) runner")
    common.add_common_args(parser)
    parser.add_argument("-distill", action="store_true",
                        help="run distillation training")
    parser.add_argument("-test_only", action="store_true")
    parser.add_argument("-student_only", action="store_true")
    parser.add_argument("-transform_bottleneck", action="store_true",
                        help="quantize/dequantize the bottleneck at eval")
    parser.add_argument("-skip_teacher_eval", action="store_true")
    parser.add_argument("--profile_dir", default=None,
                        help="capture an XLA profiler trace of the first "
                             "training steps into this directory")
    parser.add_argument("--tb_dir", default=None,
                        help="write TensorBoard scalar curves (losses per "
                             "log interval, val mAP per epoch) into this "
                             "directory")
    return parser


def distill(teacher_pack, student_pack, config, args, mesh,
            eval_jits=None):
    teacher, t_params, t_state = teacher_pack
    student, s_params, s_state = student_pack
    train_cfg = config["train"]
    student_cfg = config["student_model"]

    min_sizes = common.keypoint_min_sizes(student.kind, True)
    train_loader, val_loader, _ = common.loaders_from_config(
        config, student.kind, int(train_cfg["batch_size"]),
        min_sizes=min_sizes)

    steps_per_epoch = max(len(train_loader), 1)
    warmup = min(1000, steps_per_epoch - 1)
    optimizer, _ = build_optimizer(train_cfg["optimizer"],
                                   train_cfg.get("scheduler"),
                                   steps_per_epoch, warmup)
    box = DistillationBox(teacher, student, train_cfg["criterion"])
    frozen = student_cfg.get("frozen_modules", [])
    compute_dtype = common.compute_dtype_from_config(config)
    # tpu.steps_per_dispatch: run N optimizer steps per host dispatch via an
    # in-jit lax.scan over stacked microbatches — bit-identical update
    # sequence, amortized per-dispatch host overhead (BASELINE.md round-5)
    tpu_cfg = config.get("tpu", {}) or {}
    spd = max(int(tpu_cfg.get("steps_per_dispatch", 1)), 1)
    step = make_distill_train_step(
        box, optimizer, frozen, mesh=mesh, donate=False,
        compute_dtype=compute_dtype, steps_per_dispatch=spd,
        dispatch_unroll=max(int(tpu_cfg.get("dispatch_unroll", 1)), 1))
    # epoch-end remainders (< spd batches) dispatch through the plain step
    step1 = step if spd == 1 else make_distill_train_step(
        box, optimizer, frozen, mesh=mesh, donate=False,
        compute_dtype=compute_dtype)

    opt_state = optimizer.init(s_params)
    best_val_map = 0.0
    ckpt_path = student_cfg.get("ckpt")
    if ckpt_util.check_if_exists(ckpt_path):
        payload = ckpt_util.load_ckpt(ckpt_path)
        s_params = payload["params"]
        s_state = payload["state"] or s_state
        if payload.get("opt_state") is not None:
            opt_state = payload["opt_state"]
        best_val_map = payload.get("best_value", 0.0)
        print(f"resumed from {ckpt_path} (best val mAP {best_val_map:.4f})")

    t_params, t_state, s_params, s_state, opt_state = (
        replicate(x, mesh)
        for x in (t_params, t_state, s_params, s_state, opt_state))

    num_epochs = int(train_cfg["num_epochs"])
    log_freq = int(train_cfg.get("log_freq", 1000))
    rng = jax.random.PRNGKey(args.seed)
    profile_dir = getattr(args, "profile_dir", None)
    profile_steps = 0
    tb = SummaryWriter(getattr(args, "tb_dir", None)
                       if multihost.is_main_process() else None)
    global_step = 0

    def log_entry(logger, entry):
        # delayed-fetch read of a step's scalars (common.StepMetrics): the
        # hot loop never blocks on the step it just dispatched
        idx, loss_val, terms = entry
        logger.update(loss=loss_val, **terms)
        if idx % log_freq == 0:
            tb.add_scalar("train/loss", loss_val, idx)
            for k, v in terms.items():
                tb.add_scalar(f"train/{k}", v, idx)

    def dispatch(fn, b, tg, keys, batch_dim):
        nonlocal s_params, s_state, opt_state
        # batch stays host-side numpy: put_batch device_puts it
        # with the right sharding directly (a jnp.asarray here would
        # cost an extra device->host hop in multi-process runs)
        if box.use_org_loss:
            # org_loss_factor != 0: the step takes the padded targets
            # (reference tool.py:49-58 feeds them to the student)
            loss, loss_dict, s_params, s_state, opt_state = fn(
                t_params, t_state, s_params, s_state, opt_state,
                put_batch(b, mesh, batch_dim),
                put_batch(tg, mesh, batch_dim), keys)
        else:
            loss, loss_dict, s_params, s_state, opt_state = fn(
                t_params, t_state, s_params, s_state, opt_state,
                put_batch(b, mesh, batch_dim), keys)
        return loss, loss_dict

    for epoch in range(num_epochs):
        train_loader.set_epoch(epoch)
        logger = MetricLogger()
        metrics = common.StepMetrics()
        header = f"Epoch: [{epoch}]"
        # per-BUCKET microbatch buffering (spd > 1): consecutive loader
        # batches can come from different aspect-ratio buckets whose padded
        # shapes differ and can never stack into one dispatch
        micro = common.MicrobatchBuffer(spd)
        for batch, targets, _ in logger.log_every(train_loader, log_freq,
                                                  header):
            rng, key = jax.random.split(rng)
            if profile_dir:
                # counted per loader ITERATION at the top of the loop: a
                # buffering iteration (spd > 1) must advance the counter or
                # start_trace would fire twice
                profile_steps += 1
                if profile_steps == 3:  # skip the compile iterations
                    jax.profiler.start_trace(profile_dir)
                elif profile_steps == 7:
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {profile_dir}")
                    profile_dir = None
            if spd > 1:
                payload = micro.add(
                    batch, targets if box.use_org_loss else None, key)
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
            student, s_params, s_state, val_loader,
            use_bottleneck_transformer=args.transform_bottleneck,
            mesh=common.eval_mesh_for(val_loader, mesh), jits=eval_jits)
        val_map = float(coco_evaluator.stats["bbox"][0])
        tb.add_scalar("val/map", val_map, epoch)
        tb.flush()
        if val_map > best_val_map and ckpt_path:
            best_val_map = val_map
            # ckpt writes are master-only (reference save_on_master,
            # misc_util.py:260-262); every process agrees on val_map after
            # the evaluator merge, so the best-value bookkeeping stays
            # consistent everywhere
            multihost.save_on_master(
                ckpt_util.save_ckpt, ckpt_path, params=s_params,
                state=s_state, opt_state=opt_state,
                best_value=best_val_map, config=config, args=vars(args),
                backend=(config.get("train", {}) or {}).get(
                    "ckpt_backend", "pickle"))
            print(f"saved best ckpt (val mAP {val_map:.4f})")
    tb.close()
    multihost.barrier("mimic_distill_end")
    return s_params, s_state


def main(args):
    config = overwrite_config(load_config(args.config), args.json)
    common.enable_persistent_compilation_cache()
    distributed = multihost.maybe_init_distributed(args)
    devices = jax.devices()
    if args.world_size and not distributed:
        devices = devices[:args.world_size]
    # train.batch_size is per-process (reference DDP semantics); the mesh
    # spans every chip of every process, so the global batch scales with
    # process count
    global_batch = (int(config["train"]["batch_size"])
                    * jax.process_count())
    mesh = make_mesh_for_batch(global_batch, devices)
    print(f"mesh: {mesh.devices.size} device(s), "
          f"{jax.process_count()} process(es)")

    teacher, t_params, t_state = get_model(config["teacher_model"],
                                           seed=args.seed)
    student, s_params, s_state = get_model(config["student_model"],
                                           seed=args.seed + 1)

    # runner-scope eval program cache: per-epoch val, the post-distill test
    # eval, and every bucket shape reuse one compiled program each
    student_jits = common.JitCache(student)
    if args.distill:
        s_params, s_state = distill(
            (teacher, t_params, t_state), (student, s_params, s_state),
            config, args, mesh, eval_jits=student_jits)
    # the final test eval always runs the BEST checkpoint, including right
    # after distillation (reference mimic_runner.py:148-149 reloads the
    # best-mAP ckpt before evaluate) — not the last epoch's params
    if ckpt_util.check_if_exists(config["student_model"].get("ckpt")):
        payload = ckpt_util.load_ckpt(config["student_model"]["ckpt"])
        s_params = payload["params"]
        s_state = payload["state"] or s_state

    _, _, test_loader = common.loaders_from_config(
        config, student.kind, 1)
    eval_mesh = common.eval_mesh_for(test_loader, mesh)
    if not args.student_only and not args.skip_teacher_eval:
        print("evaluating teacher")
        common.evaluate(teacher, t_params, t_state, test_loader,
                        mesh=eval_mesh)
    print("evaluating student")
    common.evaluate(student, s_params, s_state, test_loader,
                    use_bottleneck_transformer=args.transform_bottleneck,
                    mesh=eval_mesh, jits=student_jits)


def cli():
    main(get_argparser().parse_args())


if __name__ == "__main__":
    cli()
