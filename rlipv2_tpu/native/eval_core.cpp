// Native evaluator core: the two hot loops of the HOI evaluation
// protocols, C++ equivalents of the reference's native evaluation path
// (the reference leans on pycocotools' C extension + numpy inner loops;
// this repo's evaluators call these via ctypes with a numpy fallback).
//
//  * pairwise_iou_cat — category-gated Pascal(+1) IoU matrix
//    (reference: datasets/hico_eval.py:434-470 compute_iou/compute_iou_mat)
//  * pairwise_nms — greedy (sub, obj) pair NMS with alpha/beta powered
//    overlap product (reference: datasets/hico_eval.py:510-549)
//
// Boxes are row-major float32 [a0, a1, a2, a3]; IoU pairs axes (0,2) and
// (1,3) with the +1 Pascal convention, matching the python path exactly.
//
// Build: g++ -O3 -shared -fPIC -o _eval_core.so eval_core.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

void pairwise_iou_cat(const double* b1, const int32_t* c1, int n1,
                      const double* b2, const int32_t* c2, int n2,
                      double* out) {
  // double throughout: the IoU >= 0.5 threshold must bit-match the
  // python float64 protocol the reference oracle runs
  for (int i = 0; i < n1; ++i) {
    const double* r1 = b1 + 4 * i;
    const double s1 = (r1[2] - r1[0] + 1.0) * (r1[3] - r1[1] + 1.0);
    for (int j = 0; j < n2; ++j) {
      double v = 0.0;
      if (c1[i] == c2[j]) {
        const double* r2 = b2 + 4 * j;
        const double left = r1[1] > r2[1] ? r1[1] : r2[1];
        const double right = r1[3] < r2[3] ? r1[3] : r2[3];
        const double top = r1[0] > r2[0] ? r1[0] : r2[0];
        const double bottom = r1[2] < r2[2] ? r1[2] : r2[2];
        if (left < right && top < bottom) {
          const double inter = (right - left + 1.0) * (bottom - top + 1.0);
          const double s2 = (r2[2] - r2[0] + 1.0) * (r2[3] - r2[1] + 1.0);
          v = inter / (s1 + s2 - inter);
        }
      }
      out[i * n2 + j] = v;
    }
  }
}

// Greedy pair NMS. subs/objs: (n, 4) [x1, y1, x2, y2]; scores (n,).
// keep_out must have room for n int32; returns the number kept.
int pairwise_nms(const double* subs, const double* objs, const double* scores,
                 int n, double alpha, double beta, double thresh,
                 int32_t* keep_out) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  // replicate numpy `argsort()[::-1]` EXACTLY: stable ascending sort,
  // then reverse — ties come out in descending original index order,
  // which changes greedy suppression outcomes vs a plain descending sort
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] < scores[b]; });
  std::reverse(order.begin(), order.end());
  std::vector<double> sub_area(n), obj_area(n);
  for (int i = 0; i < n; ++i) {
    sub_area[i] = (subs[4 * i + 2] - subs[4 * i] + 1.0) *
                  (subs[4 * i + 3] - subs[4 * i + 1] + 1.0);
    obj_area[i] = (objs[4 * i + 2] - objs[4 * i] + 1.0) *
                  (objs[4 * i + 3] - objs[4 * i + 1] + 1.0);
  }
  std::vector<char> alive(n, 1);
  int n_keep = 0;
  for (size_t oi = 0; oi < order.size(); ++oi) {
    const int i = order[oi];
    if (!alive[i]) continue;
    keep_out[n_keep++] = i;
    const double* si = subs + 4 * i;
    const double* qi = objs + 4 * i;
    for (size_t oj = oi + 1; oj < order.size(); ++oj) {
      const int j = order[oj];
      if (!alive[j]) continue;
      const double* sj = subs + 4 * j;
      const double* qj = objs + 4 * j;
      const double sw = std::fmax(
          0.0, std::fmin(si[2], sj[2]) - std::fmax(si[0], sj[0]) + 1.0);
      const double sh = std::fmax(
          0.0, std::fmin(si[3], sj[3]) - std::fmax(si[1], sj[1]) + 1.0);
      const double s_inter = sw * sh;
      const double s_union = sub_area[i] + sub_area[j] - s_inter;
      const double ow = std::fmax(
          0.0, std::fmin(qi[2], qj[2]) - std::fmax(qi[0], qj[0]) + 1.0);
      const double oh = std::fmax(
          0.0, std::fmin(qi[3], qj[3]) - std::fmax(qi[1], qj[1]) + 1.0);
      const double o_inter = ow * oh;
      const double o_union = obj_area[i] + obj_area[j] - o_inter;
      const double ovr = std::pow(s_inter / s_union, alpha) *
                         std::pow(o_inter / o_union, beta);
      if (ovr > thresh) alive[j] = 0;
    }
  }
  return n_keep;
}

}  // extern "C"
