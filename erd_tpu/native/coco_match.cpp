// Greedy detection<->gt matching for COCO evaluation — the per-(image,
// category, area-range) hot loop of the evaluator. The reference leans on
// pycocotools' C backend for COCO handling (SURVEY.md section 2.9); this is
// the equivalent native component for our evaluator, called via ctypes.
//
// Semantics (all IoU thresholds in one call):
//   for each threshold t:
//     for each detection d (pre-sorted by descending score):
//       scan gts (pre-sorted: non-ignored first); a gt already matched at t
//       is skipped unless it is a crowd; once the best candidate is a real
//       (non-ignored) gt, ignored gts cannot displace it; the gt with the
//       highest IoU >= threshold wins.
// Outputs: dtm[t, d] = 1-based matched gt index (0 = unmatched),
//          dtig[t, d] = 1 if the match is against an ignored gt.
//
// Build: g++ -O3 -shared -fPIC -o libcoco_match.so coco_match.cpp

#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

extern "C" {

void greedy_match(int num_thrs, const double* thrs, int num_dt, int num_gt,
                  const float* ious /* num_dt x num_gt, row-major */,
                  const uint8_t* gt_ignore, const uint8_t* gt_crowd,
                  int64_t* dtm /* num_thrs x num_dt */,
                  uint8_t* dtig /* num_thrs x num_dt */) {
  std::vector<int64_t> gtm(static_cast<size_t>(num_gt));
  for (int t = 0; t < num_thrs; ++t) {
    for (auto& v : gtm) v = 0;
    const double thr = thrs[t];
    for (int d = 0; d < num_dt; ++d) {
      double best_iou = thr < 1.0 - 1e-10 ? thr : 1.0 - 1e-10;
      int best_g = -1;
      const float* row = ious + static_cast<size_t>(d) * num_gt;
      for (int g = 0; g < num_gt; ++g) {
        if (gtm[g] != 0 && !gt_crowd[g]) continue;
        if (best_g > -1 && !gt_ignore[best_g] && gt_ignore[g]) break;
        if (row[g] < best_iou) continue;
        best_iou = row[g];
        best_g = g;
      }
      const size_t out = static_cast<size_t>(t) * num_dt + d;
      if (best_g == -1) {
        dtm[out] = 0;
        dtig[out] = 0;
      } else {
        dtm[out] = best_g + 1;
        gtm[best_g] = d + 1;
        dtig[out] = gt_ignore[best_g] ? 1 : 0;
      }
    }
  }
}

}  // extern "C"
