"""Test-only torch oracle: an independent, compact PyTorch implementation of
the YOLOX/StreamYOLO architecture (public, CVPR2022 / arXiv 2107.08430),
used to validate weight import and numerical forward parity of the JAX
models. Written from the architecture spec — NOT copied from the reference.

Structure / state_dict key layout intentionally matches the published YOLOX
module naming so the importer mapping is exercised end-to-end.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def act_fn(name):
    if name == "silu":
        return nn.SiLU(inplace=True)
    if name == "lrelu":
        return nn.LeakyReLU(0.1, inplace=True)
    return nn.ReLU(inplace=True)


class BaseConv(nn.Module):
    def __init__(self, c_in, c_out, ksize, stride, groups=1, act="silu"):
        super().__init__()
        self.conv = nn.Conv2d(
            c_in, c_out, ksize, stride, (ksize - 1) // 2, groups=groups, bias=False
        )
        self.bn = nn.BatchNorm2d(c_out, eps=1e-3, momentum=0.03)
        self.act = act_fn(act)

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class DWConv(nn.Module):
    def __init__(self, c_in, c_out, ksize, stride=1, act="silu"):
        super().__init__()
        self.dconv = BaseConv(c_in, c_in, ksize, stride, groups=c_in, act=act)
        self.pconv = BaseConv(c_in, c_out, 1, 1, act=act)

    def forward(self, x):
        return self.pconv(self.dconv(x))


class Bottleneck(nn.Module):
    def __init__(self, c_in, c_out, shortcut=True, expansion=0.5, act="silu"):
        super().__init__()
        hidden = int(c_out * expansion)
        self.conv1 = BaseConv(c_in, hidden, 1, 1, act=act)
        self.conv2 = BaseConv(hidden, c_out, 3, 1, act=act)
        self.use_add = shortcut and c_in == c_out

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        return x + y if self.use_add else y


class CSPLayer(nn.Module):
    def __init__(self, c_in, c_out, n=1, shortcut=True, expansion=0.5, act="silu"):
        super().__init__()
        hidden = int(c_out * expansion)
        self.conv1 = BaseConv(c_in, hidden, 1, 1, act=act)
        self.conv2 = BaseConv(c_in, hidden, 1, 1, act=act)
        self.conv3 = BaseConv(2 * hidden, c_out, 1, 1, act=act)
        self.m = nn.Sequential(
            *[Bottleneck(hidden, hidden, shortcut, 1.0, act=act) for _ in range(n)]
        )

    def forward(self, x):
        x1 = self.m(self.conv1(x))
        x2 = self.conv2(x)
        return self.conv3(torch.cat((x1, x2), dim=1))


class SPPBottleneck(nn.Module):
    def __init__(self, c_in, c_out, kernel_sizes=(5, 9, 13), activation="silu"):
        super().__init__()
        hidden = c_in // 2
        self.conv1 = BaseConv(c_in, hidden, 1, 1, act=activation)
        self.m = nn.ModuleList(
            [nn.MaxPool2d(k, stride=1, padding=k // 2) for k in kernel_sizes]
        )
        self.conv2 = BaseConv(hidden * 4, c_out, 1, 1, act=activation)

    def forward(self, x):
        x = self.conv1(x)
        x = torch.cat([x] + [m(x) for m in self.m], dim=1)
        return self.conv2(x)


class Focus(nn.Module):
    def __init__(self, c_in, c_out, ksize=1, stride=1, act="silu"):
        super().__init__()
        self.conv = BaseConv(c_in * 4, c_out, ksize, stride, act=act)

    def forward(self, x):
        tl = x[..., ::2, ::2]
        bl = x[..., 1::2, ::2]
        tr = x[..., ::2, 1::2]
        br = x[..., 1::2, 1::2]
        return self.conv(torch.cat((tl, bl, tr, br), dim=1))


class CSPDarknet(nn.Module):
    def __init__(self, dep_mul, wid_mul, act="silu"):
        super().__init__()
        c = int(wid_mul * 64)
        d = max(round(dep_mul * 3), 1)
        self.stem = Focus(3, c, ksize=3, act=act)
        self.dark2 = nn.Sequential(
            BaseConv(c, c * 2, 3, 2, act=act), CSPLayer(c * 2, c * 2, d, act=act)
        )
        self.dark3 = nn.Sequential(
            BaseConv(c * 2, c * 4, 3, 2, act=act), CSPLayer(c * 4, c * 4, d * 3, act=act)
        )
        self.dark4 = nn.Sequential(
            BaseConv(c * 4, c * 8, 3, 2, act=act), CSPLayer(c * 8, c * 8, d * 3, act=act)
        )
        self.dark5 = nn.Sequential(
            BaseConv(c * 8, c * 16, 3, 2, act=act),
            SPPBottleneck(c * 16, c * 16, activation=act),
            CSPLayer(c * 16, c * 16, d, shortcut=False, act=act),
        )

    def forward(self, x):
        x = self.stem(x)
        x2 = self.dark3(self.dark2(x))
        x1 = self.dark4(x2)
        x0 = self.dark5(x1)
        return x2, x1, x0


class DFPPAFPN(nn.Module):
    """PAFPN + dual-flow fusion (jian convs), torch oracle."""

    def __init__(self, depth=1.0, width=1.0, in_channels=(256, 512, 1024), act="silu"):
        super().__init__()
        ic = in_channels
        self.backbone = CSPDarknet(depth, width, act=act)
        n = round(3 * depth)
        w = width
        self.lateral_conv0 = BaseConv(int(ic[2] * w), int(ic[1] * w), 1, 1, act=act)
        self.C3_p4 = CSPLayer(int(2 * ic[1] * w), int(ic[1] * w), n, False, act=act)
        self.reduce_conv1 = BaseConv(int(ic[1] * w), int(ic[0] * w), 1, 1, act=act)
        self.C3_p3 = CSPLayer(int(2 * ic[0] * w), int(ic[0] * w), n, False, act=act)
        self.bu_conv2 = BaseConv(int(ic[0] * w), int(ic[0] * w), 3, 2, act=act)
        self.C3_n3 = CSPLayer(int(2 * ic[0] * w), int(ic[1] * w), n, False, act=act)
        self.bu_conv1 = BaseConv(int(ic[1] * w), int(ic[1] * w), 3, 2, act=act)
        self.C3_n4 = CSPLayer(int(2 * ic[1] * w), int(ic[2] * w), n, False, act=act)
        self.jian2 = BaseConv(int(ic[0] * w), int(ic[0] * w) // 2, 1, 1, act=act)
        self.jian1 = BaseConv(int(ic[1] * w), int(ic[1] * w) // 2, 1, 1, act=act)
        self.jian0 = BaseConv(int(ic[2] * w), int(ic[2] * w) // 2, 1, 1, act=act)

    def pafpn(self, x):
        x2, x1, x0 = self.backbone(x)
        fpn_out0 = self.lateral_conv0(x0)
        f_out0 = F.interpolate(fpn_out0, size=x1.shape[2:4], mode="nearest")
        f_out0 = self.C3_p4(torch.cat([f_out0, x1], 1))
        fpn_out1 = self.reduce_conv1(f_out0)
        f_out1 = F.interpolate(fpn_out1, size=x2.shape[2:4], mode="nearest")
        pan_out2 = self.C3_p3(torch.cat([f_out1, x2], 1))
        p_out1 = self.bu_conv2(pan_out2)
        pan_out1 = self.C3_n3(torch.cat([p_out1, fpn_out1], 1))
        p_out0 = self.bu_conv1(pan_out1)
        pan_out0 = self.C3_n4(torch.cat([p_out0, fpn_out0], 1))
        return pan_out2, pan_out1, pan_out0

    def fuse(self, cur, sup):
        outs = []
        for j, c, s in zip((self.jian2, self.jian1, self.jian0), cur, sup):
            outs.append(torch.cat([j(c), j(s)], dim=1) + c)
        return tuple(outs)

    def forward(self, x):
        cur = self.pafpn(x[:, :3])
        sup = self.pafpn(x[:, 3:])
        return self.fuse(cur, sup)

    def forward_online(self, x, buffer=None):
        cur = self.pafpn(x)
        sup = cur if buffer is None else buffer
        return self.fuse(cur, sup), cur


class Head(nn.Module):
    """Decoupled YOLOX head, eval forward + decode."""

    def __init__(self, num_classes, width=1.0, in_channels=(256, 512, 1024),
                 strides=(8, 16, 32), act="silu", prior_prob=1e-2):
        super().__init__()
        self.num_classes = num_classes
        self.strides = strides
        feat = int(256 * width)
        self.stems = nn.ModuleList()
        self.cls_convs = nn.ModuleList()
        self.reg_convs = nn.ModuleList()
        self.cls_preds = nn.ModuleList()
        self.reg_preds = nn.ModuleList()
        self.obj_preds = nn.ModuleList()
        for c in in_channels:
            self.stems.append(BaseConv(int(c * width), feat, 1, 1, act=act))
            self.cls_convs.append(
                nn.Sequential(BaseConv(feat, feat, 3, 1, act=act), BaseConv(feat, feat, 3, 1, act=act))
            )
            self.reg_convs.append(
                nn.Sequential(BaseConv(feat, feat, 3, 1, act=act), BaseConv(feat, feat, 3, 1, act=act))
            )
            self.cls_preds.append(nn.Conv2d(feat, num_classes, 1))
            self.reg_preds.append(nn.Conv2d(feat, 4, 1))
            self.obj_preds.append(nn.Conv2d(feat, 1, 1))
        bias = -math.log((1 - prior_prob) / prior_prob)
        for m in list(self.cls_preds) + list(self.obj_preds):
            nn.init.constant_(m.bias, bias)

    def forward(self, xin):
        outputs = []
        hw = []
        for k, x in enumerate(xin):
            x = self.stems[k](x)
            cls_out = self.cls_preds[k](self.cls_convs[k](x))
            reg_feat = self.reg_convs[k](x)
            reg_out = self.reg_preds[k](reg_feat)
            obj_out = self.obj_preds[k](reg_feat)
            out = torch.cat([reg_out, obj_out.sigmoid(), cls_out.sigmoid()], 1)
            hw.append(out.shape[2:4])
            outputs.append(out.flatten(start_dim=2))
        flat = torch.cat(outputs, dim=2).permute(0, 2, 1)
        # decode
        grids, strides_t = [], []
        for (h, w), s in zip(hw, self.strides):
            yv, xv = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
            grid = torch.stack((xv, yv), 2).view(1, -1, 2).float()
            grids.append(grid)
            strides_t.append(torch.full((1, grid.shape[1], 1), float(s)))
        grids = torch.cat(grids, dim=1)
        strides_t = torch.cat(strides_t, dim=1)
        xy = (flat[..., :2] + grids) * strides_t
        wh = torch.exp(flat[..., 2:4]) * strides_t
        return torch.cat([xy, wh, flat[..., 4:]], dim=-1)


class StreamYOLOOracle(nn.Module):
    def __init__(self, num_classes=8, depth=0.33, width=0.5):
        super().__init__()
        self.backbone = DFPPAFPN(depth, width)
        self.head = Head(num_classes, width)

    def forward(self, x):
        return self.head(self.backbone(x))


# ---------------------------------------------------------------------------
# Reference-semantics SimOTA + TAL loss oracle (dynamic shapes, per-image
# Python loop — the torch formulation our fixed-shape JAX version must match).
# ---------------------------------------------------------------------------


def _bboxes_iou_cxcywh(a, b):
    tl = torch.max(a[:, None, :2] - a[:, None, 2:] / 2, b[None, :, :2] - b[None, :, 2:] / 2)
    br = torch.min(a[:, None, :2] + a[:, None, 2:] / 2, b[None, :, :2] + b[None, :, 2:] / 2)
    area_a = torch.prod(a[:, 2:], 1)
    area_b = torch.prod(b[:, 2:], 1)
    en = (tl < br).type(tl.type()).prod(dim=2)
    inter = torch.prod(br - tl, 2) * en
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)


def _iou_loss_ref(pred, target):
    tl = torch.max(pred[:, :2] - pred[:, 2:] / 2, target[:, :2] - target[:, 2:] / 2)
    br = torch.min(pred[:, :2] + pred[:, 2:] / 2, target[:, :2] + target[:, 2:] / 2)
    area_p = torch.prod(pred[:, 2:], 1)
    area_g = torch.prod(target[:, 2:], 1)
    en = (tl < br).type(tl.type()).prod(dim=1)
    area_i = torch.prod(br - tl, 1) * en
    iou = area_i / (area_p + area_g - area_i + 1e-16)
    return 1 - iou ** 2


def _simota_one_image(gt_boxes, gt_cls, bbox_preds, obj_logits, cls_logits,
                      xs, ys, strides, num_classes):
    """Returns (fg_mask [N] bool, matched_gt [F], pred_iou [F])."""
    num_gt = gt_boxes.shape[0]
    n = bbox_preds.shape[0]
    centers_x = (xs + 0.5) * strides
    centers_y = (ys + 0.5) * strides
    gl = gt_boxes[:, 0] - 0.5 * gt_boxes[:, 2]
    gr = gt_boxes[:, 0] + 0.5 * gt_boxes[:, 2]
    gt_t = gt_boxes[:, 1] - 0.5 * gt_boxes[:, 3]
    gb = gt_boxes[:, 1] + 0.5 * gt_boxes[:, 3]
    in_boxes = (
        (centers_x[None] > gl[:, None]) & (centers_x[None] < gr[:, None])
        & (centers_y[None] > gt_t[:, None]) & (centers_y[None] < gb[:, None])
    )
    r = 2.5 * strides[None]
    in_centers = (
        (centers_x[None] > gt_boxes[:, 0:1] - r) & (centers_x[None] < gt_boxes[:, 0:1] + r)
        & (centers_y[None] > gt_boxes[:, 1:2] - r) & (centers_y[None] < gt_boxes[:, 1:2] + r)
    )
    fg_cand = (in_boxes | in_centers).any(0)
    in_both = in_boxes[:, fg_cand] & in_centers[:, fg_cand]

    preds_c = bbox_preds[fg_cand]
    pair_iou = _bboxes_iou_cxcywh(gt_boxes, preds_c)
    onehot = torch.nn.functional.one_hot(gt_cls.long(), num_classes).float()
    joint = (cls_logits[fg_cand].sigmoid() * obj_logits[fg_cand, None].sigmoid()).sqrt()
    cls_cost = torch.nn.functional.binary_cross_entropy(
        joint[None].repeat(num_gt, 1, 1),
        onehot[:, None].repeat(1, joint.shape[0], 1),
        reduction="none",
    ).sum(-1)
    cost = cls_cost + 3.0 * (-torch.log(pair_iou + 1e-8)) + 100000.0 * (~in_both)

    matching = torch.zeros_like(cost)
    n_cand = min(10, pair_iou.shape[1])
    topk_ious, _ = torch.topk(pair_iou, n_cand, dim=1)
    dynamic_ks = torch.clamp(topk_ious.sum(1).int(), min=1)
    for g in range(num_gt):
        _, pos = torch.topk(cost[g], k=int(dynamic_ks[g]), largest=False)
        matching[g][pos] = 1.0
    multi = matching.sum(0) > 1
    if multi.sum() > 0:
        _, argmin = torch.min(cost[:, multi], dim=0)
        matching[:, multi] = 0.0
        matching[argmin, multi] = 1.0
    fg_in = matching.sum(0) > 0
    fg_mask = torch.zeros(n, dtype=torch.bool)
    idx = torch.where(fg_cand)[0]
    fg_mask[idx[fg_in]] = True
    matched_gt = matching[:, fg_in].argmax(0)
    pred_iou = (matching * pair_iou).sum(0)[fg_in]
    return fg_mask, matched_gt, pred_iou


def tal_losses_torch(outputs, labels, support_labels, num_classes,
                     strides=(8, 16, 32), gamma=1.0, ignore_thr=0.5,
                     ignore_value=1.5, use_l1=True, use_tal=True):
    """Reference-semantics loss. outputs: list of [B, 5+C, H, W] raw maps."""
    flat, raws, xs_l, ys_l, ss_l = [], [], [], [], []
    for out, s in zip(outputs, strides):
        b, ch, h, w = out.shape
        yv, xv = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        grid = torch.stack((xv, yv), 2).view(1, -1, 2).float()
        o = out.flatten(2).permute(0, 2, 1).clone()
        raws.append(o[..., :4].clone())
        o[..., :2] = (o[..., :2] + grid) * s
        o[..., 2:4] = torch.exp(o[..., 2:4]) * s
        flat.append(o)
        xs_l.append(grid[0, :, 0]); ys_l.append(grid[0, :, 1])
        ss_l.append(torch.full((h * w,), float(s)))
    flat = torch.cat(flat, 1)
    raw_reg = torch.cat(raws, 1)
    xs, ys, ss = torch.cat(xs_l), torch.cat(ys_l), torch.cat(ss_l)

    bbox_preds = flat[..., :4]
    obj_logits = flat[..., 4]
    cls_logits = flat[..., 5:]

    B, N = flat.shape[:2]
    fg_masks, cls_ts, reg_ts, obj_ts, l1_ts, iou_ts = [], [], [], [], [], []
    num_fg_total, num_gts_total = 0.0, 0.0
    for bi in range(B):
        nlabel = int(((labels[bi].sum(1) > 0)).sum())
        num_gts_total += nlabel
        if nlabel == 0:
            fg_masks.append(torch.zeros(N, dtype=torch.bool))
            obj_ts.append(torch.zeros(N, 1))
            cls_ts.append(torch.zeros(0, num_classes))
            reg_ts.append(torch.zeros(0, 4))
            l1_ts.append(torch.zeros(0, 4))
            iou_ts.append(torch.zeros(0))
            continue
        gt_boxes = labels[bi, :nlabel, 1:5]
        gt_cls = labels[bi, :nlabel, 0]
        fg_mask, matched_gt, pred_iou = _simota_one_image(
            gt_boxes, gt_cls, bbox_preds[bi], obj_logits[bi], cls_logits[bi],
            xs, ys, ss, num_classes)
        num_fg_total += int(fg_mask.sum())
        fg_masks.append(fg_mask)
        cls_ts.append(
            torch.nn.functional.one_hot(gt_cls[matched_gt].long(), num_classes).float()
            * pred_iou[:, None])
        obj_ts.append(fg_mask[:, None].float())
        reg_t = gt_boxes[matched_gt]
        reg_ts.append(reg_t)
        if use_l1:
            st = ss[fg_mask]
            l1 = torch.zeros(len(reg_t), 4)
            l1[:, 0] = reg_t[:, 0] / st - xs[fg_mask]
            l1[:, 1] = reg_t[:, 1] / st - ys[fg_mask]
            l1[:, 2] = torch.log(reg_t[:, 2] / st + 1e-8)
            l1[:, 3] = torch.log(reg_t[:, 3] / st + 1e-8)
            l1_ts.append(l1)
        if use_tal:
            sup_n = int((support_labels[bi].sum(1) > 0).sum())
            if sup_n == 0:
                ious = torch.ones(nlabel)
            else:
                pair = _bboxes_iou_cxcywh(gt_boxes, support_labels[bi, :sup_n, 1:5])
                ious, _ = pair.max(dim=1)
                ious[ious < ignore_thr] = ignore_value
            iou_ts.append(ious[matched_gt])

    fg_masks = torch.cat(fg_masks)
    cls_t = torch.cat(cls_ts)
    reg_t = torch.cat(reg_ts)
    obj_t = torch.cat(obj_ts)
    num_fg = max(num_fg_total, 1)

    iou_el = _iou_loss_ref(bbox_preds.reshape(-1, 4)[fg_masks], reg_t)
    bce = torch.nn.functional.binary_cross_entropy_with_logits
    if use_tal:
        iou_target = torch.cat(iou_ts)
        weight = 1 / (iou_target ** gamma + 1e-8)
        w_iou = (weight * iou_el.sum()) / ((weight * iou_el).sum())
        loss_iou = (w_iou.detach() * iou_el).sum() / num_fg
    else:
        loss_iou = iou_el.sum() / num_fg
    loss_obj = bce(obj_logits.reshape(-1, 1), obj_t, reduction="none").sum() / num_fg
    loss_cls = bce(cls_logits.reshape(-1, num_classes)[fg_masks], cls_t,
                   reduction="none").sum() / num_fg
    if use_l1:
        l1_t = torch.cat(l1_ts)
        l1_el = torch.abs(raw_reg.reshape(-1, 4)[fg_masks] - l1_t)
        if use_tal:
            w_l1 = weight[:, None].repeat(1, 4)
            w_l1 = (w_l1 * l1_el.sum()) / ((w_l1 * l1_el).sum())
            loss_l1 = (w_l1.detach() * l1_el).sum() / num_fg
        else:
            loss_l1 = l1_el.sum() / num_fg
    else:
        loss_l1 = torch.tensor(0.0)

    total = 5.0 * loss_iou + loss_obj + loss_cls + loss_l1
    return {
        "total_loss": total,
        "iou_loss": 5.0 * loss_iou,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "l1_loss": loss_l1,
        "num_fg": num_fg / max(num_gts_total, 1),
    }
