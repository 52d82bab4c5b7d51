#!/usr/bin/env python
"""Evaluation CLI.

Mirrors ``/root/reference/tools/eval_rcnn.py``: single-checkpoint eval
(:791), the ``--eval_all`` daemon that polls the checkpoint directory and
evaluates new checkpoints as training produces them (:851-922), RPN-only /
joint eval modes, KITTI-format output + in-process AP. Seeds are pinned
like the reference (:25,499).
"""

import argparse
import glob
import logging
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

np.random.seed(1024)  # eval_rcnn.py:25


def parse_args():
    p = argparse.ArgumentParser(description='EPNet-TPU evaluation')
    p.add_argument('--cfg_file', type=str,
                   default='cfgs/LI_Fusion_with_attention_use_ce_loss.yaml')
    p.add_argument('--eval_mode', type=str, default='rcnn_online',
                   choices=['rpn', 'rcnn', 'rcnn_online', 'rcnn_offline'])
    p.add_argument('--ckpt', type=str, default=None)
    p.add_argument('--ckpt_dir', type=str, default=None)
    p.add_argument('--eval_all', action='store_true')
    p.add_argument('--max_waiting_mins', type=int, default=30)
    p.add_argument('--batch_size', type=int, default=4)
    p.add_argument('--workers', type=int, default=4)
    p.add_argument('--data_root', type=str, default='data')
    p.add_argument('--output_dir', type=str, default=None)
    p.add_argument('--save_rpn_feature', action='store_true')
    p.add_argument('--save_result', action='store_true')
    p.add_argument('--test', action='store_true', help='test split, no labels')
    p.add_argument('--max_gt', type=int, default=50)
    p.add_argument('--platform', type=str, default=None,
                   choices=('cpu', 'tpu'),
                   help='pin the JAX backend (the axon TPU plugin ignores '
                        'JAX_PLATFORMS, so use this to force CPU)')
    p.add_argument('--set', dest='set_cfgs', default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def make_logger(log_file):
    logger = logging.getLogger('epnet_tpu.eval')
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    for h in (logging.StreamHandler(), logging.FileHandler(log_file)):
        h.setFormatter(fmt)
        logger.addHandler(h)
    return logger


def load_variables(cfg, ckpt_path, sample_batch):
    """Initialize the eval model (TEST mode, train=False — the label-less
    test split cannot build a TRAIN batch) and restore checkpointed params."""
    import jax

    from epnet_tpu.models.epnet import EPNet
    from epnet_tpu.train.trainer import device_batch, restore_variables

    model = EPNet(cfg, mode='TEST')
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False))
    variables = init_fn({'params': k1, 'sampling': k2, 'dropout': k3},
                        device_batch(sample_batch))
    epoch = 0
    if ckpt_path:
        variables, epoch = restore_variables(ckpt_path, variables)
    return variables, epoch


def eval_one(cfg, args, ckpt_path, logger):
    from epnet_tpu.data import DataLoader, KittiRCNNDataset
    from epnet_tpu.eval.detect import evaluate_joint
    from epnet_tpu.eval.rpn_eval import evaluate_rpn

    mode = 'TEST' if args.test else 'EVAL'
    split = cfg.TEST.SPLIT
    dataset = KittiRCNNDataset(args.data_root, cfg, npoints=cfg.RPN.NUM_POINTS,
                               split=split, classes=cfg.CLASSES, mode=mode,
                               logger=logger, max_gt=args.max_gt)
    loader = DataLoader(dataset, args.batch_size, shuffle=False,
                        num_workers=args.workers, drop_last=False)
    sample_batch = dataset.collate_batch([dataset[i] for i in range(args.batch_size)])
    variables, epoch = load_variables(cfg, ckpt_path, sample_batch)

    tag = f'epoch_{epoch}' if ckpt_path else 'no_ckpt'
    result_dir = os.path.join(args.output_dir or 'output/eval', tag)
    os.makedirs(result_dir, exist_ok=True)

    if args.eval_mode == 'rpn':
        return evaluate_rpn(cfg, variables, dataset, loader, result_dir,
                            logger=logger, save_rpn_feature=args.save_rpn_feature)
    if args.eval_mode == 'rcnn_offline':
        from epnet_tpu.eval.rcnn_offline_eval import evaluate_rcnn_offline

        return evaluate_rcnn_offline(cfg, variables, dataset, result_dir,
                                     logger=logger, run_ap=not args.test)
    return evaluate_joint(cfg, variables, dataset, loader, result_dir,
                          logger=logger, run_ap=not args.test,
                          save_result=args.save_result)


def repeat_eval_all(cfg, args, logger, eval_fn=None, poll_interval_s=30.0):
    """Checkpoint-polling daemon (eval_rcnn.py:851-922).

    Polls ``args.ckpt_dir`` for new ``checkpoint_epoch_*`` entries, evaluates
    each exactly once (``seen`` set), and exits after ``args.max_waiting_mins``
    minutes with no new checkpoint. ``eval_fn``/``poll_interval_s`` are
    injectable for tests (tests/test_eval_daemon.py)."""
    eval_fn = eval_fn or eval_one
    seen = set()
    wait_start = time.time()
    evaluated = []
    while True:
        ckpts = sorted(glob.glob(os.path.join(args.ckpt_dir, 'checkpoint_epoch_*')))
        new = [c for c in ckpts if c not in seen]
        if not new:
            if (time.time() - wait_start) / 60 > args.max_waiting_mins:
                logger.info('no new checkpoints for %s min, exiting',
                            args.max_waiting_mins)
                return evaluated
            time.sleep(poll_interval_s)
            continue
        wait_start = time.time()
        for c in new:
            seen.add(c)
            logger.info('evaluating %s', c)
            ret = eval_fn(cfg, args, c, logger)
            evaluated.append(c)
            logger.info('%s -> %s', c, {k: v for k, v in ret.items()
                                        if not isinstance(v, str)})


def main():
    args = parse_args()
    if args.platform:
        import jax

        jax.config.update('jax_platforms', args.platform)
    from epnet_tpu.config import load_config

    overrides = []
    if args.set_cfgs:
        assert len(args.set_cfgs) % 2 == 0
        overrides = list(zip(args.set_cfgs[0::2], args.set_cfgs[1::2]))
    # fail fast with a clear message (the reference's CHECK_INPUT spirit
    # applied to the CLI surface)
    if args.cfg_file and not os.path.isfile(args.cfg_file):
        raise SystemExit(f'--cfg_file not found: {args.cfg_file}')
    if not os.path.isdir(args.data_root):
        raise SystemExit(
            f'--data_root not found: {args.data_root} (expected a KITTI '
            f'object tree: <root>/KITTI/object/training/...)')
    cfg = load_config(args.cfg_file, overrides)
    if args.eval_mode == 'rpn':
        cfg = cfg.merged({'RPN': {'ENABLED': True}, 'RCNN': {'ENABLED': False}})
    elif args.eval_mode in ('rcnn', 'rcnn_online'):
        cfg = cfg.merged({'RPN': {'ENABLED': True}, 'RCNN': {'ENABLED': True}})
    else:
        cfg = cfg.merged({'RPN': {'ENABLED': False}, 'RCNN': {'ENABLED': True}})

    from epnet_tpu.ops.pointops import apply_query_policy
    apply_query_policy(cfg)  # before any tracing: policy is trace-time state

    out = args.output_dir or 'output/eval'
    os.makedirs(out, exist_ok=True)
    logger = make_logger(os.path.join(out, 'eval.log'))

    if args.eval_all:
        assert args.ckpt_dir, '--eval_all needs --ckpt_dir'
        repeat_eval_all(cfg, args, logger)
    else:
        ret = eval_one(cfg, args, args.ckpt, logger)
        logger.info('done: %s', {k: v for k, v in ret.items()
                                 if not isinstance(v, str)})


if __name__ == '__main__':
    main()
