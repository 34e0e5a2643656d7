"""Command-line entry points (the reference's train.py / train_prn.py /
evaluate / demo notebooks, as one CLI).

Usage:
    python -m multiposenet_tpu prepare --coco-json ann.json \
        --image-dir images/ --output-dir shards/
    python -m multiposenet_tpu train  --config cfg.json --coco-json ann.json \
        --image-dir images/ [--synthetic N]
    python -m multiposenet_tpu train-prn --synthetic 512 --steps 1000
    python -m multiposenet_tpu eval   --model-dir out/ --coco-json ... \
        [--synthetic N] [--batched]
    python -m multiposenet_tpu predict --model-dir out/ --image in.jpg \
        --output out.png
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _load_config(args) -> "Config":
    from multiposenet_tpu.config import Config

    if args.config:
        return Config.from_json(Path(args.config).read_text())
    preset = getattr(args, "preset", None) or "default"
    if preset == "fast":
        return Config.fast()
    if preset == "crowd":
        return Config.crowd()
    return Config()


def _load_records(args):
    if args.coco_json:
        from multiposenet_tpu.data.coco import load_coco_keypoints

        return load_coco_keypoints(args.coco_json)
    from multiposenet_tpu.data.synthetic import make_dataset

    n = args.synthetic or 64
    return make_dataset(n, img_h=256, img_w=256, seed=0)


def cmd_prepare(args) -> None:
    """The reference's create_tfrecords.py: COCO JSON + images → shards
    (with segmentation union masks; see data/prepare.py)."""
    from multiposenet_tpu.data.prepare import prepare_coco
    from multiposenet_tpu.data.prepare import write_shards

    if args.coco_json:
        paths = prepare_coco(
            args.coco_json, args.image_dir, args.output_dir,
            shard_size=args.shard_size, max_persons=args.max_persons,
        )
    else:
        from multiposenet_tpu.data.synthetic import make_dataset

        records = make_dataset(args.synthetic or 64, seed=0)
        paths = write_shards(
            records, args.output_dir, shard_size=args.shard_size,
            max_persons=args.max_persons,
        )
    print(json.dumps({"shards": [str(p) for p in paths]}))


def cmd_train(args) -> None:
    from multiposenet_tpu.data.loader import batch_iterator
    from multiposenet_tpu.train.loop import train

    config = _load_config(args)
    if args.steps:
        import dataclasses

        config = config.replace(
            train=dataclasses.replace(config.train, num_steps=args.steps)
        )
    records = _load_records(args)
    batches = batch_iterator(
        records,
        config.train.batch_size,
        config.train.image_size,
        config.prn.max_persons,
        image_dir=args.image_dir,
        train=True,
        mask_stride=config.model.output_stride,
    )
    state = train(config, batches, log_fn=lambda m: print(json.dumps(m)))

    if args.model_dir:
        import jax

        from multiposenet_tpu.infer.export import save_model

        state = jax.device_get(state)
        save_model(
            args.model_dir,
            config,
            {"params": state.ema_params,
             "batch_stats": state.batch_stats},
        )
        print(f"exported EMA model to {args.model_dir}")


def cmd_train_prn(args) -> None:
    from multiposenet_tpu.data.loader import batch_iterator
    from multiposenet_tpu.train.prn_train import train_prn

    config = _load_config(args)
    records = _load_records(args)
    batches = batch_iterator(
        records,
        config.train.batch_size,
        config.train.image_size,
        config.prn.max_persons,
        image_dir=args.image_dir,
        train=True,
        mask_stride=config.model.output_stride,
    )
    state = train_prn(config, batches, num_steps=args.steps or 1000,
                      log_fn=lambda m: print(json.dumps(m)))
    if args.model_dir:
        import flax.serialization
        import jax

        out = Path(args.model_dir)
        out.mkdir(parents=True, exist_ok=True)
        (out / "prn.msgpack").write_bytes(
            flax.serialization.to_bytes(jax.device_get(state.params))
        )
        print(f"exported PRN to {out}")


def cmd_eval(args) -> None:
    from multiposenet_tpu.eval import runner
    from multiposenet_tpu.infer.export import load_predictor
    from multiposenet_tpu.infer.predictor import Predictor

    if args.model_dir and (Path(args.model_dir) / "config.json").exists():
        predictor = load_predictor(args.model_dir)
    else:
        predictor = Predictor(config=_load_config(args))
    records = _load_records(args)
    if args.batched:
        stats = runner.evaluate_batched(
            predictor, records, batch_size=args.batch_size,
            image_dir=args.image_dir,
        )
    else:
        stats = runner.evaluate_predictor(
            predictor, records, image_dir=args.image_dir,
            max_images=args.max_images,
        )
    print(json.dumps(stats, indent=2))


def cmd_predict(args) -> None:
    import cv2
    import numpy as np

    from multiposenet_tpu.infer.export import load_predictor
    from multiposenet_tpu.infer.predictor import Predictor
    from multiposenet_tpu.utils.visualize import draw_predictions

    if args.model_dir and (Path(args.model_dir) / "config.json").exists():
        predictor = load_predictor(args.model_dir)
    else:
        predictor = Predictor(config=_load_config(args))
    bgr = cv2.imread(args.image, cv2.IMREAD_COLOR)
    if bgr is None:
        sys.exit(f"cannot read image: {args.image}")
    rgb = np.ascontiguousarray(bgr[:, :, ::-1])
    people = predictor.predict(rgb)
    print(json.dumps([
        {"box": p.box.tolist(), "score": p.score,
         "keypoints": p.keypoints.tolist()}
        for p in people
    ]))
    if args.output:
        vis = draw_predictions(rgb, people)
        cv2.imwrite(args.output, np.ascontiguousarray(vis[:, :, ::-1]))
        print(f"wrote {args.output}", file=sys.stderr)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="multiposenet_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        p.add_argument("--config", help="config JSON path")
        p.add_argument("--preset", choices=("default", "fast", "crowd"),
                       help="named operating point when no --config is "
                            "given: 'fast' = the benchmarked TPU "
                            "throughput point, 'crowd' = fast + the "
                            "measured crowded-scene knobs (README)")
        p.add_argument("--coco-json", help="COCO person_keypoints json")
        p.add_argument("--image-dir", help="image directory for COCO")
        p.add_argument("--synthetic", type=int,
                       help="use N synthetic images instead of COCO")
        p.add_argument("--model-dir", help="export/load directory")

    p = sub.add_parser(
        "prepare", help="COCO JSON + images → packed npz shards"
    )
    common(p)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--shard-size", type=int, default=1024)
    p.add_argument("--max-persons", type=int, default=32)
    p.set_defaults(fn=cmd_prepare)

    p = sub.add_parser("train", help="train the pose network")
    common(p)
    p.add_argument("--steps", type=int)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("train-prn", help="train the PRN separately")
    common(p)
    p.add_argument("--steps", type=int)
    p.set_defaults(fn=cmd_train_prn)

    p = sub.add_parser("eval", help="COCO keypoint OKS evaluation")
    common(p)
    p.add_argument("--batched", action="store_true")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-images", type=int)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("predict", help="predict one image")
    common(p)
    p.add_argument("--image", required=True)
    p.add_argument("--output", help="write visualization PNG here")
    p.set_defaults(fn=cmd_predict)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
