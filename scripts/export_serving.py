"""Export a trained checkpoint as a self-contained serving bundle.

Usage:
  python scripts/export_serving.py --config_path configs/mrcnn/scp_mrcnn_config.json \
      --weights runs/milestone/head/weights/best.msgpack \
      --out runs/milestone/serving --batch 1 [--platforms cpu,tpu]

The bundle (m3d/serve.py) holds the AOT-lowered StableHLO inference graph,
the weights, and a manifest; a serving host needs only jax to load and run
it (ServingBundle.load(...).predict(images)). Export on a TPU host to bake
the Pallas mask-stage ROIAlign kernel; exports from a CPU host use the
portable gather formulation on every platform.
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--weights", required=True, help=".msgpack or Keras .h5")
    ap.add_argument("--out", required=True, help="bundle output directory")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering targets")
    ap.add_argument("--data_parallel", type=int, default=0,
                    help="export sharded over an n-device data mesh "
                         "(batch must divide by n; load needs n devices)")
    args = ap.parse_args()

    import jax

    from m3d.config import load_config
    from m3d.models.mask_rcnn import MaskRCNN, init_params
    from m3d.serve import export_bundle
    from m3d.train.checkpoints import load_params, restore_by_name

    config = load_config(args.config_path)
    model = MaskRCNN.from_config(config, mode="inference")
    variables = init_params(model, jax.random.PRNGKey(0))
    if args.weights.endswith(".h5"):
        from m3d.utils.h5_import import load_keras_h5

        source = load_keras_h5(args.weights)
    else:
        source, _ = load_params(args.weights)
    variables, stats = restore_by_name(variables, source)
    print(f"restored weights: {stats}")

    manifest = export_bundle(
        config, variables, args.out, batch=args.batch,
        platforms=tuple(p.strip() for p in args.platforms.split(",")),
        data_parallel=args.data_parallel or None)
    print(f"bundle written to {args.out} "
          f"(chunks={manifest['chunks']}, platforms={manifest['platforms']}, "
          f"data_parallel={manifest['data_parallel']})")


if __name__ == "__main__":
    main()
