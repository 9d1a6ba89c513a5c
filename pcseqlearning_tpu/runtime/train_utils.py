"""Train loop with checkpoint rotation, autoresume, and metric logging.

Parity with /root/reference/tools/train_utils/train_utils.py: train_one_epoch
(grad step + meters + TB scalars), train_model (epoch loop + ckpt pruning to
max_ckpt_save_num), checkpoint_state/save_checkpoint. Checkpoints are orbax
pytree saves of the TrainState (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.common_utils import AverageMeter


def save_checkpoint(state, ckpt_dir, step, max_keep=30):
    import orbax.checkpoint as ocp

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), f"checkpoint_epoch_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    # rotation (reference train_utils.py:163-170)
    ckpts = sorted(
        glob.glob(os.path.join(ckpt_dir, "checkpoint_epoch_*")),
        key=lambda p: int(p.rsplit("_", 1)[-1]),
    )
    for old in ckpts[:-max_keep]:
        import shutil

        shutil.rmtree(old, ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir):
    ckpts = sorted(
        glob.glob(os.path.join(ckpt_dir, "checkpoint_epoch_*")),
        key=lambda p: int(p.rsplit("_", 1)[-1]),
    )
    return ckpts[-1] if ckpts else None


def load_checkpoint(path, target_state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=jax.device_get(target_state))


def load_params_from_file(path, target_state, strict=False, logger=None):
    """Non-strict parameter loading with shape adaptation (reference
    RegistrationTemplate._load_state_dict,
    registration_module_template.py:98-110: keys missing from the ckpt keep
    their init values; shape-mismatched leaves adapt when the element count
    matches — the spconv 1.x<->2.x kernel-layout case — else keep init)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    try:
        loaded = ckptr.restore(os.path.abspath(path))
    except BaseException:
        loaded = ckptr.restore(os.path.abspath(path), target=jax.device_get(target_state))
    tgt = jax.device_get(target_state)

    import jax.tree_util as jtu

    tgt_flat = dict(jtu.tree_flatten_with_path(tgt)[0])
    out_flat = {}
    loaded_flat = dict(jtu.tree_flatten_with_path(loaded)[0]) if loaded is not None else {}
    n_adapt = n_skip = 0
    for pth, tleaf in tgt_flat.items():
        lleaf = loaded_flat.get(pth)
        if lleaf is None or not hasattr(tleaf, "shape"):
            out_flat[pth] = tleaf
            continue
        import numpy as np

        lleaf = np.asarray(lleaf)
        if lleaf.shape == tleaf.shape:
            out_flat[pth] = lleaf
        elif lleaf.size == getattr(tleaf, "size", -1):
            out_flat[pth] = lleaf.reshape(tleaf.shape)  # layout adaptation
            n_adapt += 1
        else:
            if strict:
                raise ValueError(f"shape mismatch at {pth}: {lleaf.shape} vs {tleaf.shape}")
            out_flat[pth] = tleaf
            n_skip += 1
    if logger is not None:
        logger.info(f"loaded {len(out_flat)} params ({n_adapt} layout-adapted, {n_skip} kept-init)")
    treedef = jtu.tree_structure(tgt)
    return jtu.tree_unflatten(treedef, [out_flat[p] for p, _ in jtu.tree_flatten_with_path(tgt)[0]])


def train_one_epoch(train_step, state, loader, batch_converter, epoch, logger=None, tb_writer=None, log_every=50):
    data_meter, batch_meter = AverageMeter(), AverageMeter()
    end = time.time()
    losses_acc = {}
    for it, batch in enumerate(loader):
        dense = batch_converter(batch)
        data_meter.update(time.time() - end)
        state, losses = train_step(state, dense)
        jax.block_until_ready(losses)
        batch_meter.update(time.time() - end)
        end = time.time()
        for k, v in losses.items():
            losses_acc.setdefault(k, AverageMeter()).update(float(v))
        if logger and it % log_every == 0:
            msg = " ".join(f"{k}={m.avg:.4f}" for k, m in losses_acc.items())
            logger.info(
                f"epoch {epoch} it {it}/{len(loader)} {msg} "
                f"data={data_meter.avg:.3f}s batch={batch_meter.avg:.3f}s"
            )
        if tb_writer is not None:
            step = int(state.step)
            for k, v in losses.items():
                tb_writer.add_scalar(f"train/{k}", float(v), step)
    return state, {k: m.avg for k, m in losses_acc.items()}


def train_model(train_step, state, loader, batch_converter, total_epochs, ckpt_dir,
                logger=None, tb_writer=None, ckpt_save_interval=1, max_ckpt_save_num=30,
                start_epoch=0):
    for epoch in range(start_epoch, total_epochs):
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)
        state, avg_losses = train_one_epoch(
            train_step, state, loader, batch_converter, epoch, logger, tb_writer
        )
        if (epoch + 1) % ckpt_save_interval == 0:
            path = save_checkpoint(state, ckpt_dir, epoch + 1, max_ckpt_save_num)
            if logger:
                logger.info(f"saved checkpoint: {path}")
    return state


# ---------------------------------------------------------------------------
# EMA (reference train_utils.py:201-220 ema sub-dict;
# registration_module_template.py:181-206 multi-ckpt EMA merge)
# ---------------------------------------------------------------------------


def ema_update(ema_params, params, decay=0.999):
    """Exponential moving average of a parameter pytree."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )


def load_ema_params_from_files(paths, target_state):
    """Average the params of several checkpoints (reference
    load_ema_params_from_files): returns target_state with mean params."""
    states = [load_checkpoint(p, target_state) for p in paths]
    n = float(len(states))
    mean_params = jax.tree_util.tree_map(
        lambda *xs: sum(xs) / n, *[s.params for s in states]
    )
    return states[-1]._replace(params=mean_params)
