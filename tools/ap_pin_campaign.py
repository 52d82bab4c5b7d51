"""Round-5 AP-pin power campaign (VERDICT r4 item 5 + item 1).

Runs tools/synthetic_ap_pin.py over a seed ladder for the PARITY recipe
and the round-5 HEADLINE candidate (parity + bf16 + block-local + approx
queries, exact FPS G=1 == the pin's `--knobs block,queries` cell),
recording PAIRED per-seed deltas. Pairing on (seed -> fixture, init, sampling)
removes the dominant variance source — the round-4 2-seed parity band
spanned 13.0-28.7 (2.2x), useless for per-knob comparisons, but the
same-seed config delta shares the fixture and data order, so a sign test
across >= 4 paired seeds resolves "at-or-above parity" vs "collapse"
cleanly (a collapse is a >5x drop, far outside pairing noise).

Also re-runs parity seed 0 first: its triple must reproduce
[5.0, 13.0132, 13.0132] BIT-EXACTLY (the round-4 reproduction gate) —
a mismatch means the parity semantics changed this round and every
other number is suspect.

Usage: python tools/ap_pin_campaign.py [--seeds 0 1 2 3] [--epochs 40]
Results append to /tmp/ap_pin_campaign.jsonl and the summary prints at
the end; the table lands in ROADMAP.md.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = '/tmp/ap_pin_campaign.jsonl'


def run_pin(seed, knobs, epochs, workdir, env=None, n_val=None):
    cmd = [sys.executable, os.path.join(REPO, 'tools', 'synthetic_ap_pin.py'),
           '--seed', str(seed), '--epochs', str(epochs),
           '--workdir', workdir]
    if n_val is not None:
        # 3x the round-4 val set (VERDICT r4 item 5: statistical power).
        # The TRAIN scenes are bit-identical either way: make_fake_kitti
        # generates scenes sequentially by sample id, so ids 0..47 see the
        # same rng draws regardless of how many val scenes follow.
        cmd += ['--val', str(n_val)]
    if knobs:
        cmd += ['--knobs', knobs]
    t0 = time.time()
    full_env = dict(os.environ, **(env or {}))
    res = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                         env=full_env)
    out = res.stdout + res.stderr
    m = re.findall(r'\{"metric": "synthetic Car 3D AP[^\n]*\}', out)
    rec = {'seed': seed,
           'knobs': ('gate' if env else knobs or 'parity'), 'epochs': epochs,
           'wall_s': round(time.time() - t0, 1), 'ok': res.returncode == 0}
    if m:
        rec['ap'] = json.loads(m[-1])['value']
    else:
        rec['tail'] = out[-2000:]
    with open(LOG, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print(json.dumps(rec if 'ap' in rec else {k: rec[k] for k in
          ('seed', 'knobs', 'ok', 'wall_s')}), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seeds', type=int, nargs='+', default=[0, 1, 2, 3])
    ap.add_argument('--epochs', type=int, default=40)
    ap.add_argument('--skip', type=str, nargs='*', default=[],
                    help='list of "knobs:seed" cells to skip (already done)')
    args = ap.parse_args()

    done = set(args.skip)
    recs = []
    # Reproduction gate first, with the round-4 eval graph: the round-5
    # fused-eval deconv head (EPNET_FUSED_HEAD_EVAL) intentionally changes
    # eval arithmetic at rounding level (dense-parity 1e-4, tests/
    # test_deconv_sample.py), so the BIT-exact comparison against the
    # round-4 triple must pin the old path. All campaign cells below run
    # the current default graph (and parity:0 below re-baselines the gate
    # triple for future rounds).
    # NB the gate must pin the WHOLE round-4 graph, train included: the
    # round-5 slot-factorized grid-sample backward is gradient-equal only
    # to 1e-5 (f32 reassociation), which a 40-epoch run amplifies into a
    # different converged model (first gate attempt with only the eval
    # knob pinned: [22.6, 39.5, 39.5] — far off the round-4 triple in the
    # FAVOURABLE direction; recorded as knobs="gate" in the log).
    if 'gate' not in done:
        recs.append(run_pin(0, '', args.epochs, '/tmp/ap_pin_gate0',
                            env={'EPNET_FUSED_HEAD_EVAL': '0',
                                 'EPNET_GS_SLOT_BWD': '0'}))
        ap0 = recs[-1].get('ap')
        gate = [5.0, 13.0132, 13.0132]
        ok = ap0 is not None and all(abs(a - b) < 5e-4
                                     for a, b in zip(ap0, gate))
        print(f'reproduction gate: {"PASS" if ok else "FAIL"} ({ap0} vs '
              f'{gate})', flush=True)

    # 'block,queries' == the round-5 HEADLINE config's quality deviations
    # from parity: bf16 + block-local + approx queries (exact FPS G=1 is
    # parity behaviour). The truly-exact query policy measured 10x slower
    # at eval (9.7 vs 90.8 scans/s, 2026-08-21) so the headline keeps the
    # approx policy and this campaign carries its quality evidence.
    for seed in args.seeds:
        for knobs in ('', 'block,queries'):
            tag = f'{knobs or "parity"}:{seed}'
            if tag in done:
                continue
            recs.append(run_pin(seed, knobs, args.epochs,
                                f'/tmp/ap_pin_{(knobs or "parity").replace(",", "_")}',
                                n_val=72))

    # summary
    table = {}
    for line in open(LOG):
        r = json.loads(line)
        if 'ap' in r and r['epochs'] == args.epochs:
            table[(r['knobs'], r['seed'])] = r['ap']
    print('\nseed | parity (e/m/h) | headline=block,queries (e/m/h) | '
          'd(moderate)')
    for seed in args.seeds:
        p = table.get(('parity', seed))
        b = table.get(('block,queries', seed))
        if p and b:
            print(f'{seed} | {p} | {b} | {b[1] - p[1]:+.1f}', flush=True)


if __name__ == '__main__':
    main()
