"""Training CLI (reference train.py:16-71 + opt.py:3-36).

Usage:
    python -m neuralrecon_w_tpu.tools.train_cli --cfg_path config/train_X.yaml \
        --exp_name X --num_epochs 20 --batch_size 2048

LR follows the linear-scaling rule LR = CANONICAL_LR * world_batch /
CANONICAL_BS (reference train.py:21-25); world batch is the global ray
batch (sharded over the device mesh, not multiplied by it).
"""

from __future__ import annotations

import argparse


def get_opts(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--test_batch_size", type=int, default=256)
    parser.add_argument("--num_epochs", type=int, default=16)
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--exp_name", type=str, default="exp")
    parser.add_argument("--save_dir", type=str, default="results")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="optional hard step cap (smoke runs)")
    parser.add_argument("--divide_lr", action="store_true",
                        help="divide LR by --lr_divisor when resuming")
    parser.add_argument("--lr_divisor", type=float, default=5)
    parser.add_argument("--n_devices", type=int, default=-1,
                        help="data-mesh size; -1 = all visible devices")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() before "
                             "touching devices: run this CLI once per "
                             "host (SPMD). On TPU pods / managed "
                             "clusters initialization auto-detects; "
                             "elsewhere pass --coordinator/"
                             "--num_processes/--process_id explicitly "
                             "(the rank args of the reference's 'ddp' "
                             "launch, train.py:55)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port (multihost "
                             "outside auto-detecting clusters)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_opts(argv)

    if args.multihost:
        # must run before any other jax API creates the backend; each
        # host then sees its local devices and the 64 cache splits are
        # partitioned across processes (datasets/cache.local_split_names)
        import jax

        if args.coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            jax.distributed.initialize()
        # establish the cross-process collective clique NOW, while every
        # process is at the same point: later the first psum fires after
        # each process independently jit-compiles the train step, and a
        # compile-time skew larger than the transport's connect window
        # (observed with gloo CPU collectives) would fail that first
        # collective. Also fails fast on broken connectivity.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("neuralrecon_w_tpu:init")

    from ..config import get_cfg_defaults
    from ..parallel.mesh import make_mesh
    from ..training.loop import Trainer, TrainerConfig
    from ..training.schedule import scaled_lr

    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.cfg_path)

    # --batch_size is per process; the effective (world) batch that the
    # LR linear-scaling rule sees multiplies by the process count, the
    # reference's num_gpus*num_nodes*batch_size rule (train.py:21-25).
    # Single-controller single-process runs shard the same global batch
    # over local devices, so there the factor is 1.
    import jax as _jax

    world_batch = args.batch_size * _jax.process_count()
    cfg.TRAINER.TRUE_BATCH_SIZE = world_batch
    cfg.TRAINER.LR = scaled_lr(cfg, world_batch)
    if args.divide_lr and args.ckpt_path:
        cfg.TRAINER.LR = cfg.TRAINER.LR / args.lr_divisor

    mesh = make_mesh(args.n_devices)
    tcfg = TrainerConfig(
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        test_batch_size=args.test_batch_size,
        exp_name=args.exp_name,
        save_dir=args.save_dir,
        ckpt_path=args.ckpt_path,
    )
    trainer = Trainer(cfg, tcfg, mesh)
    trainer.fit(max_steps=args.max_steps)
    return trainer


if __name__ == "__main__":
    main()
