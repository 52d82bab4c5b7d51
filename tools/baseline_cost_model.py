"""Per-op cost model of the reference CUDA/torch eval path on an A100.

The reference (daxiongpro/EPNet) publishes accuracy only — no speed numbers
on any hardware (see BASELINE.md). ``bench.py`` needs an honest
``vs_baseline`` anchor, so this script derives one: it walks the published
recipe's shapes (tools/cfgs/LI_Fusion_with_attention_use_ce_loss.yaml — the
same values our cfgs/ copy mirrors) op by op, assigns each op a time from an
A100 roofline (compute-bound ops) or a bandwidth/latency model (the custom
CUDA kernels), and prints a per-stage table plus the implied scans/sec.

Model assumptions (all deliberately GENEROUS to the reference):
  * A100 SXM4 80GB: 156 TFLOP/s TF32 tensor core, 19.5 TFLOP/s fp32 CUDA
    core, 2.0 TB/s HBM (1.55 effective).
  * Dense convs (image tower, deconvs) hit 40% of TF32 peak.
  * Point MLPs (1x1 Conv2d over (B, C, npoint, nsample)) hit 30% of TF32
    peak — awkward shapes, but torch/cudnn handles them as batched GEMM.
  * Eager-mode elementwise (BN, ReLU) costs pure bandwidth: 3 passes
    (read-compute-write twice) over each activation it touches.
  * Custom CUDA kernels (FPS, ball query, grouping, 3-NN, roipool, NMS)
    cost max(bandwidth at 1.4 TB/s, their serial latency). FPS launches one
    thread block per batch element (sampling_gpu.cu:93-253, block<=512),
    so a batch element's FPS runs on ONE SM: per-iteration latency is the
    block-wide scan+reduce of the distance array.
  * Kernel-launch overhead 5 us x the eager launch count, amortized over
    the batch (DataParallel replicates launches per GPU, so this is per
    batch-of-B on one A100).
  * Batch 4 per GPU (larger than the reference ever ran eval: its
    eval_rcnn.py default is 1; DataParallel training used 2-3/GPU).

TRAIN mode (MODE=train, VERDICT r2 item 2): models the fwd+bwd step of the
published 50-epoch recipe (README.md:88-92, `rcnn_online`) at the TRAIN
shapes (post-NMS 512 proposals -> 64 sampled rois/image,
LI_Fusion...yaml:135-136,171-172). Backward assumptions, still generous:
  * GEMM/conv backward = dx + dw at the SAME efficiency as forward (2x
    forward flops; blk0.conv1 skips dx — input is data).
  * BN+ReLU backward: 3 more bandwidth passes over the activation; eager
    backward re-launches each op once.
  * Index-producing custom kernels (FPS, ball query, 3-NN, NMS) have NO
    backward; grouping/gather/interp/roipool backward = a scatter-add at
    the same bytes as the forward gather (charged at full HBM_K — real
    atomics collide, we charge none of that).
  * Proposal-target layer (rotated IoU 512 rois x gt, sampling, aug) and
    loss: bandwidth + launches only. Adam: 7 passes over ~16M params.
  * DataParallel/host overhead charged at ZERO (the real reference pays
    python dataloading + per-GPU replication + scatter/gather every step).

Run: python tools/baseline_cost_model.py          (eval table)
     MODE=train python tools/baseline_cost_model.py   (train table)
"""

import os

TF32 = 156e12
F32 = 19.5e12
HBM = 1.55e12          # effective dense-op bandwidth
HBM_K = 1.4e12         # effective custom-kernel bandwidth
CONV_EFF = 0.40
GEMM_EFF = 0.30
LAUNCH = 5e-6
B = 4                  # batch per A100 (generous; reference eval default is 1)
TRAIN = os.environ.get('MODE', 'eval') == 'train'

rows = []


def add(stage, name, flops=0, bytes_=0, latency=0, eff=GEMM_EFF, peak=TF32,
        launches=1):
    t = max(flops / (peak * eff), bytes_ / HBM, latency) + launches * LAUNCH / B
    rows.append((stage, name, flops, bytes_, t))
    return t


def conv2d(stage, name, h, w, cin, cout, k=3, bn_relu=True, dx=True):
    fl = 2 * B * h * w * k * k * cin * cout
    act = B * h * w * cout * 4
    add(stage, name, flops=fl, bytes_=2 * act, eff=CONV_EFF, launches=1)
    if bn_relu:
        add(stage, name + ':bn+relu', bytes_=3 * 2 * act, launches=2)
    if TRAIN:
        # backward: dx (same flops, skipped at the input conv) + dw (same
        # flops), both at forward conv efficiency — generous (cudnn wgrad
        # at these shapes is typically slower than fprop)
        nb = (2 if dx else 1)
        add(stage, name + ':bwd', flops=nb * fl, bytes_=nb * 2 * act,
            eff=CONV_EFF, launches=nb)
        if bn_relu:
            add(stage, name + ':bn+relu:bwd', bytes_=3 * 2 * act, launches=2)


def point_mlp(stage, name, rows_, chans, bn_relu=True, dx_first=True):
    """1x1-conv stack over rows_ points: chans = [cin, c1, c2, ...]."""
    for i in range(len(chans) - 1):
        fl = 2 * B * rows_ * chans[i] * chans[i + 1]
        act = B * rows_ * chans[i + 1] * 4
        add(stage, f'{name}[{i}]', flops=fl, bytes_=2 * act, launches=1)
        if bn_relu:
            add(stage, f'{name}[{i}]:bn+relu', bytes_=3 * 2 * act, launches=2)
        if TRAIN:
            nb = 2 if (dx_first or i > 0) else 1
            add(stage, f'{name}[{i}]:bwd', flops=nb * fl, bytes_=nb * 2 * act,
                launches=nb)
            if bn_relu:
                add(stage, f'{name}[{i}]:bn+relu:bwd', bytes_=3 * 2 * act,
                    launches=2)


def gather_bwd(stage, name, bytes_):
    """Backward of a gather/grouping/interp: scatter-add at the forward's
    bytes (generous: real atomics collide; we charge pure bandwidth)."""
    if TRAIN:
        add(stage, name + ':bwd', bytes_=bytes_, launches=1)


# ---------------------------------------------------------------------------
# Image stream: 4 ImageBlocks (conv3x3 s1 + conv3x3 s2), 384x1280 input
# (pointnet2_msg.py:17-33; IMG_CHANNELS [3,64,128,256,512])
# ---------------------------------------------------------------------------
res = [(384, 1280), (192, 640), (96, 320), (48, 160)]
chan = [3, 64, 128, 256, 512]
for i in range(4):
    h, w = res[i]
    conv2d('img', f'block{i}.conv1', h, w, chan[i], chan[i + 1], dx=(i > 0))
    conv2d('img', f'block{i}.conv2(s2)', h, w, chan[i + 1], chan[i + 1])

# DeConv pyramid to full res, 16 channels each (DeConv_Reduce)
for i in range(4):
    h, w = 384, 1280
    fl = 2 * B * h * w * chan[i + 1] * 16
    add('img', f'deconv{i}', flops=fl, bytes_=2 * B * h * w * 16 * 4,
        eff=CONV_EFF)
    if TRAIN:
        add('img', f'deconv{i}:bwd', flops=2 * fl,
            bytes_=4 * B * h * w * 16 * 4, eff=CONV_EFF, launches=2)

# ---------------------------------------------------------------------------
# RPN point backbone: 4 MSG SA stages + 4 FP stages (pointnet2_msg.py,
# NPOINTS [4096,1024,256,64], NSAMPLE [16,32] per stage)
# ---------------------------------------------------------------------------
NPTS = [16384, 4096, 1024, 256, 64]
NS = [(16, 32)] * 4
MLPS = [[(16, 16, 32), (32, 32, 64)],
        [(64, 64, 128), (64, 96, 128)],
        [(128, 196, 256), (128, 196, 256)],
        [(256, 256, 512), (256, 384, 512)]]
cins = [3, 32 + 64, 128 + 128, 256 + 256]  # MSG concat outputs (+xyz inside)

for i in range(4):
    N, M = NPTS[i], NPTS[i + 1]
    # FPS: one thread block per batch element; M iterations, each a
    # block-wide scan of the N-point distance array + argmax reduce
    # (sampling_gpu.cu:93-253). ~N*8 bytes per iter through one SM's
    # L1/LSU at ~50 GB/s effective.
    fps_lat = M * (N * 8 / 50e9 + 1e-6)
    add('rpn-sa', f'sa{i}.fps(N{N}->M{M})', latency=fps_lat, launches=1)
    for (r, s), mlp in zip([NS[i]] * 2, MLPS[i]):
        pass
    for k, s in enumerate(NS[i]):
        # ball query: scan all N per centroid (ball_query_gpu.cu:9-67)
        add('rpn-sa', f'sa{i}.ball{k}(M{M}xS{s})',
            flops=B * M * N * 10, bytes_=B * M * N * 1, peak=F32, eff=1.0)
        # grouping gather: M*S rows of (cin+3) channels, read+write
        cin = cins[i] + 3
        add('rpn-sa', f'sa{i}.group{k}',
            bytes_=B * M * s * cin * 4 * 2, launches=1)
        gather_bwd('rpn-sa', f'sa{i}.group{k}', B * M * s * cin * 4 * 2)
        point_mlp('rpn-sa', f'sa{i}.mlp{k}', M * s,
                  [cin] + list(MLPS[i][k]), dx_first=(i > 0))
        # max-pool over S
        add('rpn-sa', f'sa{i}.max{k}',
            bytes_=B * M * s * MLPS[i][k][-1] * 4, launches=1)
        gather_bwd('rpn-sa', f'sa{i}.max{k}',
                   B * M * s * MLPS[i][k][-1] * 4)

FP = [(128, 128), (256, 256), (512, 512), (512, 512)]
fp_cin = [96 + 32 + 64, 128 + 128 + 128, 256 + 256 + 256, 512 + 512 + 512]
# (skip-concat channels: known_feats + unknown_feats; IMG fusion adds more —
# folded into the generous cin above)
for i in range(4):
    Nq, Mk = NPTS[i], NPTS[i + 1]
    add('rpn-fp', f'fp{i}.3nn', flops=B * Nq * Mk * 10,
        bytes_=B * Nq * Mk * 1, peak=F32, eff=1.0)
    add('rpn-fp', f'fp{i}.interp', bytes_=B * Nq * 3 * FP[i][0] * 4 * 2)
    gather_bwd('rpn-fp', f'fp{i}.interp', B * Nq * 3 * FP[i][0] * 4 * 2)
    point_mlp('rpn-fp', f'fp{i}.mlp', Nq, [fp_cin[i]] + list(FP[i]))

# LI-Fusion: grid_sample + IA attention at each stage (cheap, bandwidth)
for i in range(4):
    M = NPTS[i + 1]
    add('fusion', f'li{i}.grid_sample+IA', bytes_=B * M * 128 * 4 * 6,
        launches=8)
    gather_bwd('fusion', f'li{i}.grid_sample+IA', B * M * 128 * 4 * 6)

# RPN heads: cls [128], reg [128] over 16384 points, 76 reg channels
point_mlp('rpn-head', 'cls_fc', 16384, [128, 128, 1], bn_relu=True)
point_mlp('rpn-head', 'reg_fc', 16384, [128, 128, 76], bn_relu=True)

# ---------------------------------------------------------------------------
# Proposal layer: decode 16384 boxes, top-9000, rotated NMS -> 100 (eval) /
# 512 (train; LI_Fusion...yaml:171-172)
# ---------------------------------------------------------------------------
add('proposal', 'decode+sort', bytes_=B * 16384 * 76 * 4 * 3, launches=20)
# nms_gpu: triangular block masks, ~9000^2/2 rotated-IoU @ ~80 flops
add('proposal', 'nms9000', flops=B * 9000 * 9000 / 2 * 80, peak=F32, eff=0.5,
    launches=3)

if TRAIN:
    # proposal-target layer (proposal_target_layer.py): rotated IoU of 512
    # rois x gt, fg/bg sampling, 10-try box noise aug — bandwidth + the
    # eager launch storm (dozens of small torch ops); charged modestly
    add('target', 'iou512xgt', flops=B * 512 * 50 * 300, peak=F32, eff=0.5,
        launches=30)
    add('target', 'sample+aug', bytes_=B * 512 * 64 * 4 * 4, launches=60)

# ---------------------------------------------------------------------------
# RCNN stage: 100 rois x 512 pts eval / 64 sampled rois train
# (rcnn_net.py:137-198; ROI_PER_IMAGE=64, LI_Fusion...yaml:135-136)
# ---------------------------------------------------------------------------
R, S0 = (64 if TRAIN else 100), 512
add('rcnn', 'roipool3d', flops=B * R * 16384 * 30,
    bytes_=B * R * 16384 * 1, peak=F32, eff=1.0)
# roipool backward: scatter pooled-feature grads to the 16384-pt features
gather_bwd('rcnn', 'roipool3d', B * R * S0 * 128 * 4 * 2)
point_mlp('rcnn', 'xyz_up', R * S0, [5, 128, 128], bn_relu=False,
          dx_first=False)
point_mlp('rcnn', 'merge', R * S0, [256, 128], bn_relu=False)
SA2 = [(128, 64, (128, 128, 128), 131),
       (32, 64, (128, 128, 256), 131),
       (1, 64, (256, 256, 512), 259)]
prevN = [512, 128, 32]
for j, (M2, S2, mlp2, cin2) in enumerate(SA2):
    if M2 > 1:
        fps_lat = M2 * (prevN[j] * 8 / 50e9 + 1e-6) * R / 108  # R blocks fill SMs
        add('rcnn', f'sa{j}.fps', latency=fps_lat)
        add('rcnn', f'sa{j}.ball', flops=B * R * M2 * prevN[j] * 10,
            peak=F32, eff=1.0)
    add('rcnn', f'sa{j}.group', bytes_=B * R * M2 * S2 * cin2 * 4 * 2)
    gather_bwd('rcnn', f'sa{j}.group', B * R * M2 * S2 * cin2 * 4 * 2)
    point_mlp('rcnn', f'sa{j}.mlp', R * M2 * S2, [cin2] + list(mlp2),
              bn_relu=False)
point_mlp('rcnn', 'cls_fc', R, [512, 512, 512, 1], bn_relu=False)
point_mlp('rcnn', 'reg_fc', R, [512, 512, 512, 52], bn_relu=False)

if TRAIN:
    # losses (RPN focal + bin-reg over 16384 pts x 76ch, RCNN cls/reg):
    # elementwise bandwidth, fwd+bwd + the eager launch count
    add('loss', 'rpn+rcnn', bytes_=B * 16384 * 76 * 4 * 6, launches=80)
    # Adam over ~16M params: read p/g/m/v, write p/m/v = 7 passes
    # (train_rcnn.py uses the fastai-style Adam w/ true wd)
    add('optim', 'adam16M', bytes_=16e6 * 4 * 7, launches=12)

# ---------------------------------------------------------------------------
# Report
# ---------------------------------------------------------------------------
if __name__ == '__main__':
    import collections
    per_stage = collections.OrderedDict()
    for stage, name, fl, by, t in rows:
        per_stage.setdefault(stage, [0.0, 0.0, 0.0])
        per_stage[stage][0] += fl
        per_stage[stage][1] += by
        per_stage[stage][2] += t

    total = sum(v[2] for v in per_stage.values())
    print(f'mode: {"TRAIN (fwd+bwd)" if TRAIN else "eval"}')
    print(f'{"stage":<10} {"GFLOP/b":>9} {"GB/b":>7} {"ms/batch":>9}')
    for k, (fl, by, t) in per_stage.items():
        print(f'{k:<10} {fl / 1e9:9.1f} {by / 1e9:7.2f} {t * 1e3:9.2f}')
    print(f'{"TOTAL":<10} {sum(v[0] for v in per_stage.values()) / 1e9:9.1f} '
          f'{sum(v[1] for v in per_stage.values()) / 1e9:7.2f} {total * 1e3:9.2f}')
    print(f'\nbatch={B}: {total * 1e3:.1f} ms -> '
          f'{B / total:.1f} scans/sec on one A100')
    print('top items:')
    for stage, name, fl, by, t in sorted(rows, key=lambda r: -r[4])[:12]:
        print(f'  {stage}/{name}: {t * 1e3:.2f} ms')
