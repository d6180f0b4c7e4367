// Native runtime kernels for streamyolo_tpu (host-side hot loops).
//
// TPU-native equivalents of the reference's compiled components
// (SURVEY.md §2.2):
//   * cocoeval_match_image: the per-image T x D x G greedy matching loop of
//     COCOeval — the hot part the reference accelerates with its C++
//     `yolox.layers.COCOeval_opt` (imported at
//     /root/reference/exps/evaluators/onex_stream_evaluator.py:252).
//   * iou_assoc_greedy: the greedy score-ordered IoU association the
//     reference compiles with Cython (sAP/track/iou_assoc_cp.pyx:4-48).
//
// Plain C ABI (no pybind11 in this image); bound from Python via ctypes in
// streamyolo_tpu/native/__init__.py. Build: g++ -O3 -shared -fPIC.

#include <cstdint>
#include <vector>
#include <algorithm>
#include <cmath>

extern "C" {

// Greedy COCO matching for one (image, category, area-range) cell.
//
// Inputs:
//   ious     [D x G] row-major IoU(dt, gt); dts sorted by descending score,
//            gts sorted ignored-last (the caller prepares both orders).
//   gt_ig    [G]     gt ignore flags (0/1) in the sorted order.
//   iscrowd  [G]     crowd flags in the sorted order.
//   iou_thrs [T]     ascending IoU thresholds.
//   dt_ids   [D], gt_ids [G] annotation ids.
// Outputs (pre-allocated by caller):
//   dtm   [T x D] matched gt id per dt (0 = unmatched)
//   gtm   [T x G] matched dt id per gt (0 = unmatched)
//   dt_ig [T x D] dt ignore flags
void cocoeval_match_image(
    const double* ious, int64_t D, int64_t G,
    const uint8_t* gt_ig, const uint8_t* iscrowd,
    const double* iou_thrs, int64_t T,
    const int64_t* dt_ids, const int64_t* gt_ids,
    int64_t* dtm, int64_t* gtm, uint8_t* dt_ig) {
  std::fill(dtm, dtm + T * D, int64_t(0));
  std::fill(gtm, gtm + T * G, int64_t(0));
  std::fill(dt_ig, dt_ig + T * D, uint8_t(0));
  if (D == 0 || G == 0) return;

  for (int64_t t = 0; t < T; ++t) {
    int64_t* dtm_t = dtm + t * D;
    int64_t* gtm_t = gtm + t * G;
    uint8_t* dtig_t = dt_ig + t * D;
    const double thr = std::min(iou_thrs[t], 1.0 - 1e-10);
    for (int64_t d = 0; d < D; ++d) {
      double best = thr;
      int64_t m = -1;
      const double* iou_d = ious + d * G;
      for (int64_t g = 0; g < G; ++g) {
        // gt already matched (and not crowd): skip
        if (gtm_t[g] > 0 && !iscrowd[g]) continue;
        // dt already matched a real gt; remaining gts are ignored: stop
        if (m > -1 && gt_ig[m] == 0 && gt_ig[g] == 1) break;
        if (iou_d[g] < best) continue;
        best = iou_d[g];
        m = g;
      }
      if (m == -1) continue;
      dtig_t[d] = gt_ig[m];
      dtm_t[d] = gt_ids[m];
      gtm_t[m] = dt_ids[d];
    }
  }
}

// Greedy score-ordered IoU association (labels must match; each prev box
// matched at most once). Outputs: matched1/matched2 pairs and unmatched2;
// returns counts via n_matched / n_unmatched2.
void iou_assoc_greedy(
    const double* ious, int64_t m, int64_t n,
    const int64_t* labels1, const int64_t* labels2,
    double match_iou_th,
    int64_t* matched1, int64_t* matched2, int64_t* unmatched2,
    int64_t* n_matched, int64_t* n_unmatched2) {
  std::vector<char> used(m, 0);
  int64_t nm = 0, nu = 0;
  for (int64_t j = 0; j < n; ++j) {
    double best = match_iou_th;
    int64_t match_i = -1;
    for (int64_t i = 0; i < m; ++i) {
      if (used[i] || labels1[i] != labels2[j]) continue;
      const double iou = ious[i * n + j];
      if (iou < best) continue;
      best = iou;
      match_i = i;
    }
    if (match_i < 0) {
      unmatched2[nu++] = j;
    } else {
      matched1[nm] = match_i;
      matched2[nm] = j;
      ++nm;
      used[match_i] = 1;
    }
  }
  *n_matched = nm;
  *n_unmatched2 = nu;
}

// Pairwise IoU of ltwh boxes (crowd => intersection-over-dt-area), the
// box-mode maskUtils.iou capability (used by track association).
void bbox_iou_ltwh(
    const double* dt, int64_t n_dt,
    const double* gt, int64_t n_gt,
    const uint8_t* iscrowd,
    double* out) {
  for (int64_t i = 0; i < n_dt; ++i) {
    const double dx1 = dt[i * 4], dy1 = dt[i * 4 + 1];
    const double dw = dt[i * 4 + 2], dh = dt[i * 4 + 3];
    const double dx2 = dx1 + dw, dy2 = dy1 + dh;
    const double d_area = dw * dh;
    for (int64_t j = 0; j < n_gt; ++j) {
      const double gx1 = gt[j * 4], gy1 = gt[j * 4 + 1];
      const double gw = gt[j * 4 + 2], gh = gt[j * 4 + 3];
      const double gx2 = gx1 + gw, gy2 = gy1 + gh;
      const double iw = std::max(0.0, std::min(dx2, gx2) - std::max(dx1, gx1));
      const double ih = std::max(0.0, std::min(dy2, gy2) - std::max(dy1, gy1));
      const double inter = iw * ih;
      const double uni = iscrowd[j] ? d_area : d_area + gw * gh - inter;
      out[i * n_gt + j] = uni > 0 ? inter / uni : 0.0;
    }
  }
}

}  // extern "C"
