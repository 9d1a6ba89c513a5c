"""Evaluation CLI (reference /root/reference/tools/test.py): single-ckpt or
eval-all polling mode over the checkpoint directory."""

from __future__ import annotations

import argparse
import datetime
import glob
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "PCSEQ_CACHE_DIR", os.path.expanduser("~/.cache/pcseqlearning_tpu/jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from pcseqlearning_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from pcseqlearning_tpu.datasets import build_dataloader
from pcseqlearning_tpu.models import build_network
from pcseqlearning_tpu.parallel.train_step import dense_batch_from_collated, _flatten_local, init_train_state
from pcseqlearning_tpu.runtime import train_utils
from pcseqlearning_tpu.runtime.optimization import build_optimizer
from pcseqlearning_tpu.utils import common_utils, dist_utils


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("cfg_file", type=str)
    parser.add_argument("data_cfg_file", type=str)
    parser.add_argument("optim_cfg_file", type=str, nargs="?", default=None)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--eval_all", action="store_true")
    parser.add_argument("--max_waiting_mins", type=int, default=30)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg_from_yaml_file(args.data_cfg_file, cfg)
    if args.optim_cfg_file:
        cfg_from_yaml_file(args.optim_cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    return args, cfg


def eval_ckpt(model, state, loader, dataset, logger, n_cap):
    det_annos = []
    for batch in loader:
        dense = dense_batch_from_collated(batch, n_cap)
        bd = _flatten_local(
            jnp.asarray(dense["points"]), jnp.asarray(dense["feats"]),
            jnp.asarray(dense["valid"]), jnp.asarray(dense["gt_boxes"]),
        )
        out, boxes, scores, labels, valid = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, bd,
            method="predict",
        )
        pred_dicts = []
        for b in range(boxes.shape[0]):
            v = np.asarray(valid[b])
            pred_dicts.append(dict(
                pred_boxes=np.asarray(boxes[b])[v],
                pred_scores=np.asarray(scores[b])[v],
                pred_labels=np.asarray(labels[b])[v],
            ))
        det_annos += dataset.generate_prediction_dicts(batch, pred_dicts, cfg.CLASS_NAMES)
    # multi-host: each process evaluated its loader shard — merge to rank 0
    # before scoring (reference eval_utils.py:77-78 merge_results_dist)
    det_annos = dist_utils.merge_results_dist(det_annos, len(dataset))
    if det_annos is None:  # non-zero rank
        return None
    result_str, results = dataset.evaluation(det_annos, cfg.CLASS_NAMES)
    logger.info(result_str)
    return results


def main():
    args, cfg = parse_config()
    # absorb the tunneled backend's first-D2H channel stall behind the
    # host-only config/dataset setup
    from pcseqlearning_tpu.utils.warmup import warm_d2h_async

    warm_d2h_async()
    output_dir = Path(cfg.ROOT_DIR) / "output" / cfg.TAG / args.extra_tag / "eval"
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = common_utils.create_logger(
        str(output_dir / ("log_eval_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")))
    )
    dataset, loader = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch_size, training=False)
    runtime_cfg = dict(data_cfg=cfg.DATA_CONFIG, class_names=list(cfg.CLASS_NAMES),
                       voxel_cap=int(cfg.MODEL.get("VOXEL_CAP", 16384)))
    model = build_network(cfg.MODEL, runtime_cfg, dataset)
    tx, _ = build_optimizer(cfg.get("OPTIMIZATION", {}), 1, 1)
    n_cap = int(cfg.MODEL.get("POINT_CAP", 32768))
    first = next(iter(loader))
    state = init_train_state(model, tx, dense_batch_from_collated(first, n_cap))

    if args.eval_all:
        seen = set()
        deadline = time.time() + args.max_waiting_mins * 60
        while time.time() < deadline:
            ckpts = sorted(glob.glob(os.path.join(args.ckpt_dir, "checkpoint_epoch_*")))
            todo = [c for c in ckpts if c not in seen]
            if not todo:
                time.sleep(30)
                continue
            for c in todo:
                seen.add(c)
                state = train_utils.load_checkpoint(c, state)
                logger.info(f"evaluating {c}")
                eval_ckpt(model, state, loader, dataset, logger, n_cap)
            deadline = time.time() + args.max_waiting_mins * 60
    else:
        if args.ckpt:
            state = train_utils.load_checkpoint(args.ckpt, state)
        eval_ckpt(model, state, loader, dataset, logger, n_cap)


if __name__ == "__main__":
    main()
