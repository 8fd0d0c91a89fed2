"""S3FD face detector: torch-oracle parity + decode/NMS semantics.

Oracle re-implements the public s3fd net (as shipped in
face_alignment/detection/sfd, which the reference configures at
inferno/utils/FaceDetector.py:79-94) in torch inside this file, per the
repo convention."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from avi_talking_tpu.models.sfd import (
    S3FD,
    SfdDetector,
    decode_priors,
    nms,
    sfd_params_from_torch,
)


class TL2Norm(tnn.Module):
    def __init__(self, n, scale):
        super().__init__()
        self.weight = tnn.Parameter(torch.full((n,), float(scale)))

    def forward(self, x):
        norm = x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10
        return x / norm * self.weight.view(1, -1, 1, 1)


class TS3FD(tnn.Module):
    def __init__(self):
        super().__init__()
        C = tnn.Conv2d
        self.conv1_1 = C(3, 64, 3, 1, 1)
        self.conv1_2 = C(64, 64, 3, 1, 1)
        self.conv2_1 = C(64, 128, 3, 1, 1)
        self.conv2_2 = C(128, 128, 3, 1, 1)
        self.conv3_1 = C(128, 256, 3, 1, 1)
        self.conv3_2 = C(256, 256, 3, 1, 1)
        self.conv3_3 = C(256, 256, 3, 1, 1)
        self.conv4_1 = C(256, 512, 3, 1, 1)
        self.conv4_2 = C(512, 512, 3, 1, 1)
        self.conv4_3 = C(512, 512, 3, 1, 1)
        self.conv5_1 = C(512, 512, 3, 1, 1)
        self.conv5_2 = C(512, 512, 3, 1, 1)
        self.conv5_3 = C(512, 512, 3, 1, 1)
        self.fc6 = C(512, 1024, 3, 1, 3)
        self.fc7 = C(1024, 1024, 1, 1, 0)
        self.conv6_1 = C(1024, 256, 1, 1, 0)
        self.conv6_2 = C(256, 512, 3, 2, 1)
        self.conv7_1 = C(512, 128, 1, 1, 0)
        self.conv7_2 = C(128, 256, 3, 2, 1)
        self.conv3_3_norm = TL2Norm(256, 10)
        self.conv4_3_norm = TL2Norm(512, 8)
        self.conv5_3_norm = TL2Norm(512, 5)
        self.conv3_3_norm_mbox_conf = C(256, 4, 3, 1, 1)
        self.conv3_3_norm_mbox_loc = C(256, 4, 3, 1, 1)
        self.conv4_3_norm_mbox_conf = C(512, 2, 3, 1, 1)
        self.conv4_3_norm_mbox_loc = C(512, 4, 3, 1, 1)
        self.conv5_3_norm_mbox_conf = C(512, 2, 3, 1, 1)
        self.conv5_3_norm_mbox_loc = C(512, 4, 3, 1, 1)
        self.fc7_mbox_conf = C(1024, 2, 3, 1, 1)
        self.fc7_mbox_loc = C(1024, 4, 3, 1, 1)
        self.conv6_2_mbox_conf = C(512, 2, 3, 1, 1)
        self.conv6_2_mbox_loc = C(512, 4, 3, 1, 1)
        self.conv7_2_mbox_conf = C(256, 2, 3, 1, 1)
        self.conv7_2_mbox_loc = C(256, 4, 3, 1, 1)

    def forward(self, x):
        r = F.relu
        h = r(self.conv1_2(r(self.conv1_1(x))))
        h = F.max_pool2d(h, 2, 2)
        h = r(self.conv2_2(r(self.conv2_1(h))))
        h = F.max_pool2d(h, 2, 2)
        h = r(self.conv3_3(r(self.conv3_2(r(self.conv3_1(h))))))
        f3_3 = h
        h = F.max_pool2d(h, 2, 2)
        h = r(self.conv4_3(r(self.conv4_2(r(self.conv4_1(h))))))
        f4_3 = h
        h = F.max_pool2d(h, 2, 2)
        h = r(self.conv5_3(r(self.conv5_2(r(self.conv5_1(h))))))
        f5_3 = h
        h = F.max_pool2d(h, 2, 2)
        h = r(self.fc7(r(self.fc6(h))))
        ffc7 = h
        h = r(self.conv6_2(r(self.conv6_1(h))))
        f6_2 = h
        h = r(self.conv7_2(r(self.conv7_1(h))))
        f7_2 = h
        f3_3 = self.conv3_3_norm(f3_3)
        f4_3 = self.conv4_3_norm(f4_3)
        f5_3 = self.conv5_3_norm(f5_3)
        cls1 = self.conv3_3_norm_mbox_conf(f3_3)
        chunk = torch.chunk(cls1, 4, 1)
        bmax = torch.max(torch.max(chunk[0], chunk[1]), chunk[2])
        cls1 = torch.cat([bmax, chunk[3]], dim=1)
        heads = [
            (cls1, self.conv3_3_norm_mbox_loc(f3_3)),
            (self.conv4_3_norm_mbox_conf(f4_3),
             self.conv4_3_norm_mbox_loc(f4_3)),
            (self.conv5_3_norm_mbox_conf(f5_3),
             self.conv5_3_norm_mbox_loc(f5_3)),
            (self.fc7_mbox_conf(ffc7), self.fc7_mbox_loc(ffc7)),
            (self.conv6_2_mbox_conf(f6_2), self.conv6_2_mbox_loc(f6_2)),
            (self.conv7_2_mbox_conf(f7_2), self.conv7_2_mbox_loc(f7_2)),
        ]
        out = []
        for c, g in heads:
            out.append(F.softmax(c, dim=1))  # detect-side softmax
            out.append(g)
        return out


def test_s3fd_torch_parity():
    gen = torch.Generator().manual_seed(0)
    oracle = TS3FD()
    for p in oracle.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    oracle.eval()
    variables = sfd_params_from_torch(oracle.state_dict())
    x = torch.randn((1, 3, 64, 64), generator=gen)
    with torch.no_grad():
        ref = oracle(x)
    ours = S3FD().apply(variables, jnp.asarray(
        x.permute(0, 2, 3, 1).numpy()))
    assert len(ours) == 12
    for o, r in zip(ours, ref):
        # raw loc maps reach |~10^3| with these random weights: compare
        # relatively (measured rel err ~3e-6, pure float accumulation)
        np.testing.assert_allclose(
            np.asarray(o), r.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=5e-4)


def test_decode_priors_identity_and_shift():
    priors = np.asarray([[32.0, 32.0, 16.0, 16.0]], np.float32)
    # zero loc -> the prior box itself, corner form
    box = decode_priors(np.zeros((1, 4), np.float32), priors)
    np.testing.assert_allclose(box[0], [24, 24, 40, 40])
    # center shift: dx=1 with variance 0.1 moves the center by 0.1*16
    box = decode_priors(np.asarray([[1.0, 0, 0, 0]], np.float32), priors)
    np.testing.assert_allclose(box[0], [24 + 1.6, 24, 40 + 1.6, 40])
    # size: dw with variance 0.2 scales exponentially
    box = decode_priors(np.asarray([[0, 0, np.log(2.0) / 0.2, 0]],
                                   np.float32), priors)
    np.testing.assert_allclose(box[0], [16, 24, 48, 40], atol=1e-5)


def test_nms_suppresses_overlaps_keeps_disjoint():
    dets = np.asarray([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],   # IoU ~0.69 with the first -> suppressed
        [50, 50, 60, 60, 0.7],  # disjoint -> kept
    ], np.float32)
    keep = nms(dets, 0.3)
    assert keep == [0, 2]


def test_sfd_importer_unwraps_state_dict_nesting():
    gen = torch.Generator().manual_seed(1)
    oracle = TS3FD()
    for p in oracle.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    flat = sfd_params_from_torch(oracle.state_dict())
    nested = sfd_params_from_torch({"state_dict": oracle.state_dict()})
    np.testing.assert_allclose(
        flat["params"]["conv1_1"]["kernel"],
        nested["params"]["conv1_1"]["kernel"])
    assert flat["params"].keys() == nested["params"].keys()


def test_sfd_detector_flow_and_best_box_fallback():
    """Random-weight detector: output structure, thresholding, and the
    best_box previous-frame fallback."""
    net = S3FD()
    rng = np.random.default_rng(0)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    det = SfdDetector(v, threshold=0.99)  # random net ~0.5 conf -> empty
    frames = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    res = det(frames)
    assert len(res) == 2 and all(r.shape[1] == 5 for r in res)
    bb = det.best_box(frames)
    assert bb.shape == (2, 5)
    if all(len(r) == 0 for r in res):
        # no detections anywhere: whole-frame fallback, zero confidence
        np.testing.assert_allclose(bb[0], [0, 0, 63, 63, 0])
    # device decode under the same high threshold: same fallback
    np.testing.assert_allclose(det.best_box_device(frames)[0],
                               bb[0], atol=1e-4)


def test_sfd_best_box_device_matches_host_top1():
    """The on-device top-1 decode (best_box_device — fetches (T, 5)
    instead of the 6-scale score/reg pyramids) returns the same box as
    the host NMS path's argmax when a detection clears the threshold."""
    net = S3FD()
    rng = np.random.default_rng(3)
    v = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    # accept everything: host keeps the global argmax det, device returns
    # the same anchor decoded with the same prior math
    det = SfdDetector(v, threshold=-1.0, candidate_floor=-1.0)
    frames = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    host = det.best_box(frames)
    dev = det.best_box_device(frames)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)
    # uint8 transport gives the same boxes
    u8 = (frames * 255).astype(np.uint8)
    dev_u8 = det.best_box_device(u8)
    np.testing.assert_allclose(dev_u8[:, :4], host[:, :4], atol=1.5)
