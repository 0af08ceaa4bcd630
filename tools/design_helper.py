"""Student-design helper: verify a candidate student backbone produces
teacher-compatible tensor shapes at chosen capture points.

CLI replacement for the reference's src/student_design_helper.ipynb
(``compare_io_shapes`` / ``check_if_shape_match`` on a random input).

Usage:
  python tools/design_helper.py --teacher resnet50 \
      --student custom_resnet50 --bottleneck 3 --height 192 --width 256
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


CAPTURE_POINTS = ("backbone.body.layer1", "backbone.body.layer2",
                  "backbone.body.layer3", "backbone.body.layer4",
                  "backbone.fpn")


def shapes_at_capture_points(model, params, state, images):
    _, fpn, _, _ = model.backbone_features(params, state, images,
                                           training=False)
    body, _, _, _ = model.backbone_features(params, state, images,
                                            training=False)
    out = {}
    feats, _, _ = model.body.apply(params["backbone"]["body"],
                                   state["backbone"]["body"],
                                   model.normalize(images))
    for i in (1, 2, 3, 4):
        out[f"backbone.body.layer{i}"] = tuple(feats[f"layer{i}"].shape)
    out["backbone.fpn"] = [tuple(f.shape) for f in fpn]
    return out


def check_if_shape_match(teacher_shapes, student_shapes) -> bool:
    ok = True
    for key in teacher_shapes:
        t, s = teacher_shapes[key], student_shapes.get(key)
        match = t == s
        print(f"{key:26s} teacher={t} student={s} "
              f"{'OK' if match else 'MISMATCH'}")
        ok &= match
    return ok


def main():
    from hnd_ghnd_tpu.models.factory import build_model
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="resnet50")
    p.add_argument("--student", default="custom_resnet50")
    p.add_argument("--bottleneck", type=int, default=3)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args()

    teacher = build_model({
        "name": "faster_rcnn",
        "backbone": {"name": args.teacher,
                     "params": {"pretrained": False, "freeze_layers": True}},
        "params": {"num_classes": 91}})
    student = build_model({
        "name": "faster_rcnn",
        "backbone": {"name": args.student,
                     "params": {"pretrained": False, "freeze_layers": False,
                                "layer1": {"name": "Bottleneck4LargeResNet",
                                           "bottleneck_channel": args.bottleneck}}},
        "params": {"num_classes": 91}})
    tp, ts = teacher.init(jax.random.PRNGKey(0))
    sp, ss = student.init(jax.random.PRNGKey(1))
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, args.height, args.width, 3),
        jnp.float32)
    t_shapes = shapes_at_capture_points(teacher, tp, ts, images)
    s_shapes = shapes_at_capture_points(student, sp, ss, images)
    ok = check_if_shape_match(t_shapes, s_shapes)
    print("shape-compatible" if ok else "NOT compatible")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
