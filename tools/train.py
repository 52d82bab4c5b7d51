#!/usr/bin/env python
"""Training CLI.

Mirrors ``/root/reference/tools/train_rcnn.py`` (argparse :23-53, mode
matrix :163-181, logger/config dump :187-206, optimizer :95-123, trainer
launch :251-276): same train modes (rpn / rcnn_online / rcnn_offline /
rcnn), same config override mechanics (--cfg_file + --set), resume and
rpn warm-start, on a jitted data-parallel TPU train step.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser(description='EPNet-TPU training')
    p.add_argument('--cfg_file', type=str,
                   default='cfgs/LI_Fusion_with_attention_use_ce_loss.yaml')
    p.add_argument('--train_mode', type=str, default='rcnn_online',
                   choices=['rpn', 'rcnn', 'rcnn_online', 'rcnn_offline'])
    p.add_argument('--batch_size', type=int, default=4)
    p.add_argument('--epochs', type=int, default=50)
    p.add_argument('--workers', type=int, default=8)
    p.add_argument('--ckpt_save_interval', type=int, default=5)
    p.add_argument('--steps_per_call', type=int, default=1,
                   help='train steps fused per device dispatch (lax.scan)')
    p.add_argument('--output_dir', type=str, default=None)
    p.add_argument('--data_root', type=str, default='data')
    p.add_argument('--ckpt', type=str, default=None, help='resume checkpoint')
    p.add_argument('--rpn_ckpt', type=str, default=None,
                   help='warm-start rpn weights (partial restore)')
    p.add_argument('--gt_database', type=str, default=None)
    p.add_argument('--rcnn_training_roi_dir', type=str, default=None)
    p.add_argument('--rcnn_training_feature_dir', type=str, default=None)
    p.add_argument('--train_with_eval', action='store_true')
    p.add_argument('--n_devices', type=int, default=None)
    p.add_argument('--max_gt', type=int, default=50)
    p.add_argument('--seed', type=int, default=0,
                   help='training RNG seed (also seeds model init and the loader shuffle)')
    p.add_argument('--platform', type=str, default=None,
                   choices=('cpu', 'tpu'),
                   help='pin the JAX backend (the axon TPU plugin ignores '
                        'JAX_PLATFORMS, so use this to force CPU)')
    p.add_argument('--set', dest='set_cfgs', default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def apply_train_mode(cfg, mode):
    """Mode -> RPN/RCNN enabled/fixed flags (train_rcnn.py:163-181)."""
    if mode == 'rpn':
        return cfg.merged({'RPN': {'ENABLED': True, 'FIXED': False},
                           'RCNN': {'ENABLED': False}})
    if mode == 'rcnn':
        return cfg.merged({'RPN': {'ENABLED': True, 'FIXED': True},
                           'RCNN': {'ENABLED': True}})
    if mode == 'rcnn_online':
        return cfg.merged({'RPN': {'ENABLED': True, 'FIXED': False},
                           'RCNN': {'ENABLED': True}})
    if mode == 'rcnn_offline':
        return cfg.merged({'RPN': {'ENABLED': False},
                           'RCNN': {'ENABLED': True}})
    raise ValueError(mode)


def make_logger(log_file):
    logger = logging.getLogger('epnet_tpu')
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    for h in (logging.StreamHandler(), logging.FileHandler(log_file)):
        h.setFormatter(fmt)
        logger.addHandler(h)
    return logger


def main():
    args = parse_args()
    import jax

    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    import numpy as np

    from epnet_tpu.config import load_config, save_config
    from epnet_tpu.data import DataLoader, KittiRCNNDataset
    from epnet_tpu.parallel.mesh import make_mesh, replicate_state
    from epnet_tpu.train.trainer import (Trainer, create_train_state,
                                         load_checkpoint, restore_partial)

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
    cfg = apply_train_mode(cfg, args.train_mode)

    from epnet_tpu.ops.pointops import apply_query_policy
    apply_query_policy(cfg)  # before any tracing: policy is trace-time state

    tag = os.path.splitext(os.path.basename(args.cfg_file))[0]
    out_dir = args.output_dir or os.path.join('output', args.train_mode, tag)
    ckpt_dir = os.path.join(out_dir, 'ckpt')
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = make_logger(os.path.join(out_dir, 'train.log'))
    logger.info('devices: %s', jax.devices())
    save_config(cfg, logger=logger)

    # source backup into the output dir (reference train_rcnn.py:200-206)
    import tarfile
    src_root = os.path.join(os.path.dirname(__file__), '..')
    with tarfile.open(os.path.join(out_dir, 'source.tar.gz'), 'w:gz') as tar:
        for sub in ('epnet_tpu', 'tools', 'cfgs', 'native'):
            p = os.path.join(src_root, sub)
            if os.path.isdir(p):
                tar.add(p, arcname=sub,
                        filter=lambda ti: None if '__pycache__' in ti.name else ti)

    dataset = KittiRCNNDataset(
        args.data_root, cfg, npoints=cfg.RPN.NUM_POINTS, split=cfg.TRAIN.SPLIT,
        classes=cfg.CLASSES, mode='TRAIN', logger=logger,
        gt_database_dir=args.gt_database, max_gt=args.max_gt,
        rcnn_training_roi_dir=args.rcnn_training_roi_dir,
        rcnn_training_feature_dir=args.rcnn_training_feature_dir)
    loader = DataLoader(dataset, args.batch_size, shuffle=True,
                        num_workers=args.workers, drop_last=True,
                        seed=args.seed)

    steps_per_epoch = len(loader)
    total_steps = steps_per_epoch * args.epochs
    sample_batch = dataset.collate_batch([dataset[i] for i in range(args.batch_size)])
    state, model, tx = create_train_state(
        cfg, jax.random.PRNGKey(args.seed), sample_batch, total_steps, steps_per_epoch)

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(state.params))
    logger.info('model parameters: %.2fM', n_params / 1e6)

    start_epoch = 0
    if args.ckpt:
        state, saved_epoch = load_checkpoint(args.ckpt, state)
        # checkpoints are written AFTER the saved epoch finishes — resume at
        # the next one (re-running it would also overrun the OneCycle
        # schedule, since state.step was restored)
        start_epoch = saved_epoch + 1
        logger.info('resumed from %s: epoch %d done, continuing at %d',
                    args.ckpt, saved_epoch, start_epoch)
    elif args.rpn_ckpt:
        state = restore_partial(args.rpn_ckpt, state)
        logger.info('warm-started rpn weights from %s', args.rpn_ckpt)

    mesh = None
    if args.n_devices is None and len(jax.devices()) > 1 or \
            (args.n_devices or 0) > 1:
        mesh = make_mesh(args.n_devices)
        state = replicate_state(mesh, state)
        logger.info('data-parallel mesh over %d devices', mesh.size)

    from epnet_tpu.utils.metrics import SummaryWriter
    tb = SummaryWriter(os.path.join(out_dir, 'tensorboard'))
    trainer = Trainer(cfg, model, tx, state, ckpt_dir=ckpt_dir, mesh=mesh,
                      ckpt_save_interval=args.ckpt_save_interval, logger=logger,
                      tb_log=tb, steps_per_call=args.steps_per_call,
                      seed=args.seed)

    eval_fn = eval_loader = None
    if args.train_with_eval:
        from epnet_tpu.eval.detect import evaluate_joint

        val_ds = KittiRCNNDataset(args.data_root, cfg, npoints=cfg.RPN.NUM_POINTS,
                                  split=cfg.TRAIN.VAL_SPLIT, classes=cfg.CLASSES,
                                  mode='EVAL', logger=logger, max_gt=args.max_gt)
        eval_loader = DataLoader(val_ds, args.batch_size, shuffle=False,
                                 num_workers=args.workers, drop_last=False)

        def eval_fn(state, loader_, epoch):
            variables = {'params': state.params, 'batch_stats': state.batch_stats}
            ret = evaluate_joint(cfg, variables, val_ds, loader_,
                                 os.path.join(out_dir, f'eval_epoch_{epoch}'),
                                 logger=logger, run_ap=True)
            for k, v in ret.items():
                if isinstance(v, (int, float)):
                    tb.scalar(f'val/{k}', v, epoch)

    trainer.train(start_epoch, args.epochs, loader,
                  eval_loader=eval_loader, eval_fn=eval_fn)
    logger.info('training finished')


if __name__ == '__main__':
    main()
