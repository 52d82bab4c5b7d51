"""Synthetic-AP regression pin (VERDICT r2 item 5).

No real KITTI exists in this environment, so the accuracy north star
(Car 3D AP R40 82.68 moderate, /root/reference/README.md:74) cannot be
measured directly. This script is the tracked stand-in: it builds a
structured synthetic KITTI tree with a DISJOINT train/val split
(utils/testing.make_fake_kitti(n_val=...)), trains the published recipe
(cfgs/LI_Fusion_with_attention_use_ce_loss.yaml) end-to-end through the
real tools/train.py CLI for a fixed on-chip budget, evaluates through the
real tools/eval.py CLI, and prints the Car 3D AP R40 as one JSON line.

The absolute number is synthetic-data-specific and meaningless vs the
reference; what matters is that it REPRODUCES across seeds within a band
(recorded in ROADMAP.md) — a codec/target-assignment/NMS regression shows
up as a collapse, exactly like the structured-overfit test but through the
full train->checkpoint->eval->AP pipeline at full model size.

Usage:
    python tools/synthetic_ap_pin.py --seed 0 [--epochs 40] [--scenes 48]
        [--val 24] [--workdir /tmp/ap_pin] [--speed-mode]

--speed-mode benches the quality-ablated flagship config instead of the
published parity recipe (both bands are recorded).
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--epochs', type=int, default=40)
    p.add_argument('--scenes', type=int, default=48)
    p.add_argument('--val', type=int, default=24)
    p.add_argument('--batch_size', type=int, default=4)
    p.add_argument('--workdir', type=str, default='/tmp/ap_pin')
    p.add_argument('--points', type=int, default=14000)
    p.add_argument('--speed-mode', action='store_true',
                   help='flagship speed config instead of the parity recipe')
    p.add_argument('--knobs', type=str, default='',
                   help='comma subset of {fps,block,queries}: apply only '
                        'these speed-mode knobs on top of the parity '
                        'recipe (isolates which approximation costs AP; '
                        'see the round-4 band in ROADMAP.md)')
    p.add_argument('--keep-data', action='store_true')
    args = p.parse_args()

    tag = ('speed' if args.speed_mode
           else f'parity+{args.knobs}' if args.knobs else 'parity')
    work = os.path.join(args.workdir, f'seed{args.seed}')
    data_root = os.path.join(work, 'data')
    out_dir = os.path.join(work, 'out')
    os.makedirs(data_root, exist_ok=True)

    sys.path.insert(0, REPO)
    from epnet_tpu.utils.testing import make_fake_kitti
    if not os.path.exists(os.path.join(data_root, 'KITTI', 'ImageSets',
                                       'train.txt')):
        print(f'building synthetic KITTI: {args.scenes} train / '
              f'{args.val} val scenes', flush=True)
        make_fake_kitti(data_root, n_samples=args.scenes, n_val=args.val,
                        n_points=args.points, seed=args.seed, max_cars=4)

    cfg = os.path.join(REPO, 'cfgs', 'LI_Fusion_with_attention_use_ce_loss.yaml')
    overrides = []
    if args.speed_mode:
        overrides = ['--set', 'MIXED_PRECISION', 'True',
                     'EXACT_QUERIES', 'False', 'RPN.FPS_GROUPS', '8',
                     'RPN.BLOCK_LOCAL', 'True', 'RCNN.BLOCK_LOCAL', 'True']
    elif args.knobs:
        kv = []
        knobs = set(args.knobs.split(','))
        assert knobs <= {'fps', 'block', 'blockrpn', 'blockrcnn', 'queries',
                         'residual', 'fpwin'}, knobs
        if 'fps' in knobs:
            kv += ['RPN.FPS_GROUPS', '8']
        if 'block' in knobs:
            kv += ['RPN.BLOCK_LOCAL', 'True', 'RCNN.BLOCK_LOCAL', 'True']
        if 'blockrpn' in knobs:   # round-5 bisection: RPN side only
            kv += ['RPN.BLOCK_LOCAL', 'True']
        if 'blockrcnn' in knobs:  # RCNN windowed only (needs RPN sort — no-op
            kv += ['RCNN.BLOCK_LOCAL', 'True']  # without blockrpn; documented)
        if 'queries' in knobs:
            kv += ['EXACT_QUERIES', 'False']
        if 'residual' in knobs:
            # tri-state policy: block-local paths on, residual ops exact
            # (the round-5 fix for the block x approx collapse)
            kv += ['EXACT_QUERIES', 'residual']
        if 'fpwin' in knobs:
            # round-5 middle mode: dense SA + sorted FPS + windowed FP at
            # a doubled window (see config.RPN.FP_WINDOW); pairs against
            # the 'queries' cell to isolate the windowed-FP quality cost
            # at W=512 from the full block-local collapse at W=256
            kv += ['RPN.FP_WINDOW', '512', 'RPN.FP_UBLOCK', '256',
                   'EXACT_QUERIES', 'False']
        overrides = ['--set', 'MIXED_PRECISION', 'True'] + kv

    train_cmd = [sys.executable, os.path.join(REPO, 'tools', 'train.py'),
                 '--cfg_file', cfg, '--data_root', data_root,
                 '--batch_size', str(args.batch_size),
                 '--epochs', str(args.epochs),
                 '--ckpt_save_interval', str(args.epochs),
                 '--workers', '2', '--output_dir', out_dir,
                 '--seed', str(args.seed)] + overrides
    print(' '.join(train_cmd), flush=True)
    subprocess.run(train_cmd, check=True, cwd=REPO)

    ckpt_dir = os.path.join(out_dir, 'ckpt')
    ckpts = sorted(os.listdir(ckpt_dir),
                   key=lambda c: int(re.search(r'\d+', c).group()))
    ckpt = os.path.join(ckpt_dir, ckpts[-1])

    eval_cmd = [sys.executable, os.path.join(REPO, 'tools', 'eval.py'),
                '--cfg_file', cfg, '--data_root', data_root,
                '--batch_size', str(args.batch_size),
                '--ckpt', ckpt, '--output_dir',
                os.path.join(out_dir, 'eval')] + overrides
    print(' '.join(eval_cmd), flush=True)
    res = subprocess.run(eval_cmd, check=True, cwd=REPO,
                         capture_output=True, text=True)
    sys.stderr.write(res.stderr[-4000:])
    print(res.stdout[-4000:], flush=True)

    # "3d   AP: e, m, h" from the eval log (kitti_ap.get_official_eval_result)
    m = re.findall(r'3d\s+AP:\s*([\d.]+),\s*([\d.]+),\s*([\d.]+)',
                   res.stdout + res.stderr)
    if not m:
        raise SystemExit('no 3D AP line found in eval output')
    easy, mod, hard = (float(v) for v in m[-1])
    print(json.dumps({
        'metric': 'synthetic Car 3D AP R40 (easy/moderate/hard)',
        'seed': args.seed,
        'config': tag,
        'epochs': args.epochs,
        'value': [easy, mod, hard],
    }), flush=True)


if __name__ == '__main__':
    main()
