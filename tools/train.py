"""Training CLI — config composition parity with the reference
(/root/reference/tools/train.py:22-72): three positional configs (model,
dataset, optimizer) + optional visualizer cfg, dotted --set overrides,
output dir derived from cfg paths, autoresume from the latest checkpoint.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "PCSEQ_CACHE_DIR", os.path.expanduser("~/.cache/pcseqlearning_tpu/jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from pcseqlearning_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file, log_config_to_file
from pcseqlearning_tpu.datasets import build_dataloader
from pcseqlearning_tpu.models import build_network
from pcseqlearning_tpu.parallel import make_mesh, make_train_step
from pcseqlearning_tpu.parallel.train_step import dense_batch_from_collated, init_train_state
from pcseqlearning_tpu.runtime.optimization import build_optimizer
from pcseqlearning_tpu.runtime import train_utils
from pcseqlearning_tpu.utils import common_utils


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("cfg_file", type=str, help="model config")
    parser.add_argument("data_cfg_file", type=str, help="dataset config")
    parser.add_argument("optim_cfg_file", type=str, help="optimizer config")
    parser.add_argument("vis_cfg_file", type=str, nargs="?", default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg_from_yaml_file(args.data_cfg_file, cfg)
    cfg_from_yaml_file(args.optim_cfg_file, cfg)
    if args.vis_cfg_file:
        cfg_from_yaml_file(args.vis_cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(Path(args.cfg_file).parts[1:-1])
    return args, cfg


def main():
    args, cfg = parse_config()
    # multi-host init MUST precede any JAX backend use (the warm thread
    # below initializes the backend; jax.distributed.initialize after that
    # point is rejected / sees only local devices)
    from pcseqlearning_tpu.utils import dist_utils

    dist_utils.init_distributed()
    # absorb the tunneled backend's first-D2H channel stall behind the
    # host-only config/dataset setup
    from pcseqlearning_tpu.utils.warmup import warm_d2h_async

    warm_d2h_async()
    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    output_dir = Path(cfg.ROOT_DIR) / "output" / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    output_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / ("log_train_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S"))
    logger = common_utils.create_logger(str(log_file))
    logger.info("**********************Start logging**********************")
    log_config_to_file(cfg, logger=logger)

    data_cfg = cfg.DATA_CONFIG
    batch_size = args.batch_size or int(cfg.OPTIMIZATION.get("BATCH_SIZE_PER_GPU", 2))
    epochs = args.epochs or int(cfg.OPTIMIZATION.get("NUM_EPOCHS", 30))

    dataset, loader = build_dataloader(
        data_cfg, cfg.CLASS_NAMES, batch_size, training=True,
    )

    if cfg.MODEL.NAME == "SimpleReg":
        # extraction pipeline: host-driven, no optimizer state
        model = build_network(cfg.MODEL)
        for batch in loader:
            model(batch)
        logger.info("extraction finished")
        return

    runtime_cfg = dict(
        data_cfg=data_cfg, class_names=list(cfg.CLASS_NAMES),
        voxel_cap=int(cfg.MODEL.get("VOXEL_CAP", 16384)),
    )
    model = build_network(cfg.MODEL, runtime_cfg, dataset)
    tx, sched = build_optimizer(cfg.OPTIMIZATION, len(loader), epochs)

    mesh = make_mesh()
    n_cap = int(cfg.MODEL.get("POINT_CAP", 32768))
    converter = lambda b: dense_batch_from_collated(b, n_cap)

    first = next(iter(loader))
    state = init_train_state(model, tx, converter(first))
    start_epoch = 0
    latest = train_utils.latest_checkpoint(str(ckpt_dir))
    if args.ckpt or latest:
        path = args.ckpt or latest
        state = train_utils.load_checkpoint(path, state)
        start_epoch = int(path.rsplit("_", 1)[-1])
        logger.info(f"resumed from {path} at epoch {start_epoch}")

    # two-stage models put first+second-stage losses in 'total_loss'
    # (detectors._run_roi_stage); differentiating only the RPN loss would
    # leave the RoI head untrained
    if "ROI_HEAD" in cfg.MODEL:
        loss_key = "total_loss"
    elif cfg.MODEL.DENSE_HEAD.NAME == "CenterHead":
        loss_key = "center_loss"
    else:
        loss_key = "rpn_loss"
    train_step = make_train_step(model, tx, mesh, loss_key=loss_key)

    try:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(str(output_dir / "tensorboard"))
    except ImportError:
        tb = None

    train_utils.train_model(
        train_step, state, loader, converter, epochs, str(ckpt_dir),
        logger=logger, tb_writer=tb, max_ckpt_save_num=args.max_ckpt_save_num,
        start_epoch=start_epoch,
    )
    logger.info("**********************Training done**********************")


if __name__ == "__main__":
    main()
