#!/usr/bin/env python
"""Standalone PointNet++ foreground-segmentation harness.

Rebuild of the reference's kernel-validation mini-project
(``/root/reference/pointnet2_lib/tools/``: model pointnet2_msg.py:21,
train/eval loop train_and_eval.py:63-131): a self-contained KITTI
foreground-segmentation train/eval that exercises FPS, ball query,
grouping and FP interpolation end-to-end without the detector — the
de-facto integration test for the point kernels (SURVEY.md §4.2).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def build_model(cfg):
    import jax.numpy as jnp
    from flax import linen as nn

    from epnet_tpu.models.pointnet2 import FPModule, SAModuleMSG

    class SegNet(nn.Module):
        @nn.compact
        def __call__(self, pts, train=False):
            sa = cfg.RPN.SA_CONFIG
            xyz, feats = pts[..., 0:3], None
            l_xyz, l_feats = [xyz], [feats]
            for i in range(len(sa.NPOINTS)):
                nxyz, nfeats, _ = SAModuleMSG(
                    npoint=sa.NPOINTS[i], radii=sa.RADIUS[i],
                    nsamples=sa.NSAMPLE[i], mlps=sa.MLPS[i],
                    name=f'sa{i}')(l_xyz[i], l_feats[i], train=train)
                l_xyz.append(nxyz)
                l_feats.append(nfeats)
            n_fp = len(cfg.RPN.FP_MLPS)
            fps = [FPModule(mlp=cfg.RPN.FP_MLPS[k], name=f'fp{k}')
                   for k in range(n_fp)]
            for i in range(-1, -(n_fp + 1), -1):
                l_feats[i - 1] = fps[i](l_xyz[i - 1], l_xyz[i],
                                        l_feats[i - 1], l_feats[i], train=train)
            h = nn.Dense(128)(l_feats[0])
            h = nn.relu(h)
            return nn.Dense(1)(h)[..., 0]  # per-point fg logit

    return SegNet()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_root', type=str, default='data')
    p.add_argument('--epochs', type=int, default=10)
    p.add_argument('--batch_size', type=int, default=4)
    p.add_argument('--lr', type=float, default=0.002)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from epnet_tpu.config import Config
    from epnet_tpu.data import DataLoader, KittiRCNNDataset
    from epnet_tpu.losses import dice_loss

    cfg = Config().merged({'RPN': {'USE_INTENSITY': False}})
    train_ds = KittiRCNNDataset(args.data_root, cfg, split='train',
                                classes='Car', mode='TRAIN')
    val_ds = KittiRCNNDataset(args.data_root, cfg, split='val',
                              classes='Car', mode='EVAL')
    train_loader = DataLoader(train_ds, args.batch_size, num_workers=4)
    val_loader = DataLoader(val_ds, args.batch_size, shuffle=False, num_workers=4)

    model = build_model(cfg)
    sample = train_ds.collate_batch([train_ds[0]])
    variables = model.init(jax.random.PRNGKey(0), sample['pts_input'], train=True)
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables['params'])

    @jax.jit
    def train_step(params, bs, opt_state, batch):
        def loss_fn(p):
            logits, mut = model.apply({'params': p, 'batch_stats': bs},
                                      batch['pts_input'], train=True,
                                      mutable=['batch_stats'])
            # DiceLoss like train_and_eval.py:45-61
            return dice_loss(logits, batch['rpn_cls_label']), mut['batch_stats']
        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    @jax.jit
    def eval_step(params, bs, batch):
        logits = model.apply({'params': params, 'batch_stats': bs},
                             batch['pts_input'], train=False)
        pred = logits > 0
        fg = batch['rpn_cls_label'] > 0
        inter = jnp.sum(pred & fg)
        union = jnp.sum(pred) + jnp.sum(fg) - inter
        return inter / jnp.clip(union, 1, None)

    params, bs = variables['params'], variables.get('batch_stats', {})
    for epoch in range(args.epochs):
        t0, losses = time.time(), []
        for batch in train_loader:
            params, bs, opt_state, loss = train_step(params, bs, opt_state, batch)
            losses.append(float(loss))
        ious = [float(eval_step(params, bs, b)) for b in val_loader]
        print(f'epoch {epoch}: loss {np.mean(losses):.4f} '
              f'val fg-IoU {np.mean(ious):.4f} ({time.time()-t0:.1f}s)')


if __name__ == '__main__':
    main()
