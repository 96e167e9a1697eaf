"""CLI task dispatcher — same surface as the reference (main.py:11-77).

    python main.py --task {RPN_TRAINING, RPN_EVALUATION, TARGET_GENERATION,
                           HEAD_TRAINING, MRCNN_TRAINING, MRCNN_EVALUATION}
                   --config_path configs/....json [--summary]
"""

from __future__ import annotations

import argparse
import json
import os

TASKS = (
    "RPN_TRAINING",
    "RPN_EVALUATION",
    "TARGET_GENERATION",
    "HEAD_TRAINING",
    "MRCNN_TRAINING",
    "MRCNN_EVALUATION",
)


def main():
    parser = argparse.ArgumentParser(
        description="m3d — TPU-native 3D Mask R-CNN"
    )
    parser.add_argument("--task", required=True, choices=TASKS)
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--summary", action="store_true",
                        help="print the config and model summary, then exit")
    args = parser.parse_args()

    from m3d.config import load_config

    config = load_config(args.config_path)

    # Persistent XLA compilation cache: first compile of each graph shape
    # through the axon remote-compile tunnel costs minutes; reruns hit disk.
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("M3D_COMPILE_CACHE", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.summary:
        config.display()

    if args.task == "RPN_TRAINING":
        from m3d.train.rpn import RPNTrainer

        trainer = RPNTrainer(config, mode="training")
        if args.summary:
            return
        trainer.train()

    elif args.task == "RPN_EVALUATION":
        from m3d.train.rpn import RPNTrainer
        from m3d.utils.metrics import rpn_evaluation

        trainer = RPNTrainer(config, mode="training")
        if args.summary:
            return
        variables = trainer.init_variables()
        predict = trainer.make_proposal_fn(variables)
        _, test_ds = trainer.prepare_datasets()
        metrics = rpn_evaluation(predict, test_ds, config,
                                 max_images=int(config.EVALUATION_STEPS))
        print(json.dumps(metrics, indent=2))

    elif args.task == "TARGET_GENERATION":
        from m3d.train.rpn import RPNTrainer

        trainer = RPNTrainer(config, mode="targeting")
        if args.summary:
            return
        trainer.head_target_generation()

    elif args.task == "HEAD_TRAINING":
        from m3d.train.head import HeadTrainer

        trainer = HeadTrainer(config)
        if args.summary:
            return
        if config.MODE == "training_head_e2e":
            trainer.train_e2e()
        else:
            trainer.train_head_only()

    elif args.task == "MRCNN_TRAINING":
        from m3d.train.mrcnn import MrcnnTrainer

        trainer = MrcnnTrainer(config)
        if args.summary:
            return
        trainer.train()

    elif args.task == "MRCNN_EVALUATION":
        from m3d.train.mrcnn import MrcnnTrainer

        trainer = MrcnnTrainer(config)
        if args.summary:
            return
        trainer.evaluate()


if __name__ == "__main__":
    main()
