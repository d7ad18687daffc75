// Cross-implementation parity driver: runs the REFERENCE decoder
// (datemoon/ASR-decoder LatticeFasterDecoder, built Kaldi-free from
// /root/reference with two shadow-patched headers — see build.sh) over a
// graph written by asr_decoder_tpu's StdFst.write_binary (same binary
// layout as ref ReadFst, ref: src/newfst/optimize-fst.h:226-280) and a raw
// loglikes matrix, then prints the 1-best path so a pytest harness can
// assert that TpuBeamSearch produces identical words and cost.
//
// Usage: refparity_main GRAPH.fst INPUT.blob [beam max_active min_active
//                                             nbest]
//
// INPUT.blob layout (little-endian, written by decoder/ref_parity.py):
//   i32 T, i32 V, i32 L, f32 acoustic_scale,
//   i32 i2p[L]          (arc ilabel -> AM output row),
//   f32 loglikes[T*V]   (row-major, unscaled)
//
// Output lines:
//   frames=T
//   nonempty=0|1
//   cost=<float> graph=<float> acoustic=<float>
//   words=w1 w2 ...
//   ilabels=i1 i2 ...
// and with nbest=N > 0, the reference's own lattice n-best pipeline
// (GetRawLattice -> DeterminizeLatticeWrapper -> NShortestPath ->
// ConvertNbestToVector, exactly OnlineClgLatticeFastDecoder::GetNbest,
// ref: src/kaldi-nnet3/kaldi-online-nnet3-my-decoder.cc:97-105):
//   nbest=k
//   nb<i> cost=<float> graph=<float> words=w1 w2 ...
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "src/itf/decodable-itf.h"
#include "src/my-decoder/lattice-faster-decoder.h"
#include "src/newfst/lattice-determinize-api.h"
#include "src/newfst/lattice-fst.h"
#include "src/newfst/lattice-functions.h"
#include "src/newfst/lattice-to-nbest.h"
#include "src/newfst/optimize-fst.h"

// Matrix-backed decodable: LogLikelihood(frame, ilabel) returns the
// pre-scaled AM score for the arc's input label, matching the in-search
// contract (ref: lattice-faster-decoder.cc:306 "- LogLikelihood(nnetframe,
// arc->_input)"; TpuBeamSearch applies the same acoustic_scale in
// ops/beamsearch.py candN).
class MatrixDecodable : public DecodableInterface {
 public:
  MatrixDecodable(const std::vector<float>& ll, int T, int V,
                  const std::vector<int>& i2p, float scale)
      : ll_(ll), T_(T), V_(V), i2p_(i2p), scale_(scale) {}
  float LogLikelihood(int frame, int ilabel) override {
    if (frame < 0 || frame >= T_) {
      std::fprintf(stderr, "LogLikelihood frame %d out of range\n", frame);
      std::exit(3);
    }
    int pdf = (ilabel >= 0 && ilabel < (int)i2p_.size()) ? i2p_[ilabel] : -1;
    if (pdf < 0 || pdf >= V_) {
      std::fprintf(stderr, "ilabel %d -> pdf %d out of range\n", ilabel, pdf);
      std::exit(3);
    }
    return scale_ * ll_[(size_t)frame * V_ + pdf];
  }
  bool IsLastFrame(int frame) const override { return frame >= T_ - 1; }
  int NumFramesReady() const override { return T_; }
  int NumIndices() const override { return V_; }

 private:
  const std::vector<float>& ll_;
  int T_, V_;
  const std::vector<int>& i2p_;
  float scale_;
};

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s GRAPH.fst INPUT.blob [beam max_active "
                 "min_active]\n",
                 argv[0]);
    return 2;
  }
  Fst graph;
  if (!graph.ReadFst(argv[1])) {
    std::fprintf(stderr, "cannot read graph %s\n", argv[1]);
    return 2;
  }
  FILE* fp = std::fopen(argv[2], "rb");
  if (!fp) {
    std::fprintf(stderr, "cannot read blob %s\n", argv[2]);
    return 2;
  }
  int T = 0, V = 0, L = 0;
  float scale = 1.0f;
  if (std::fread(&T, 4, 1, fp) != 1 || std::fread(&V, 4, 1, fp) != 1 ||
      std::fread(&L, 4, 1, fp) != 1 || std::fread(&scale, 4, 1, fp) != 1) {
    std::fprintf(stderr, "truncated blob header\n");
    return 2;
  }
  std::vector<int> i2p(L);
  std::vector<float> ll((size_t)T * V);
  if ((int)std::fread(i2p.data(), 4, L, fp) != L ||
      std::fread(ll.data(), 4, ll.size(), fp) != ll.size()) {
    std::fprintf(stderr, "truncated blob body\n");
    return 2;
  }
  std::fclose(fp);

  LatticeFasterDecoderConfig config;
  if (argc > 3) config._beam = std::atof(argv[3]);
  if (argc > 4) config._max_active = std::atoi(argv[4]);
  if (argc > 5) config._min_active = std::atoi(argv[5]);
  int nbest = (argc > 6) ? std::atoi(argv[6]) : 0;

  MatrixDecodable decodable(ll, T, V, i2p, scale);
  LatticeFasterDecoder decoder(&graph, config);
  decoder.InitDecoding();
  decoder.AdvanceDecoding(&decodable);

  // 1-best through the reference's own lattice pipeline: GetRawLattice
  // (exact surviving ForwardLinks) + LatticeShortestPath (min-cost arc per
  // hop, ref: src/newfst/lattice-functions.cc:12-105).  NOT the
  // backpointer TraceBackBestPath — that scans for the *first* forward
  // link whose next token matches, which with parallel same-dst arcs can
  // return a non-Viterbi link (observed: identical ilabels, wrong olabel
  // and cost), so it is unsuitable as a parity oracle.
  Lattice raw, best;
  bool ok = decoder.GetRawLattice(&raw, /*use_final_probs=*/true);
  if (ok) LatticeShortestPath(&raw, &best);
  std::printf("frames=%d\n", T);
  ok = ok && best.Start() != kNoStateId;
  std::printf("nonempty=%d\n", ok ? 1 : 0);
  if (!ok) return 0;

  // Walk the single-path lattice from its start state, summing the
  // (graph, acoustic) weight components (ref GetBestPath(Lattice&,...)
  // traversal, lattice-faster-decoder.cc:1037-1073).
  double graph_cost = 0.0, ac_cost = 0.0;
  std::vector<int> words, ilabels;
  StateId s = best.Start();
  while (true) {
    LatticeState* st = best.GetState(s);
    if (st == NULL || st->GetArcSize() == 0) break;
    LatticeArc* arc = st->GetArc(0);
    if (arc->_input != 0) ilabels.push_back(arc->_input);
    if (arc->_output != 0) words.push_back(arc->_output);
    graph_cost += arc->_w.Value1();
    ac_cost += arc->_w.Value2();
    s = arc->_to;
  }
  std::printf("cost=%.6f graph=%.6f acoustic=%.6f\n", graph_cost + ac_cost,
              graph_cost, ac_cost);
  std::printf("words=");
  for (size_t i = 0; i < words.size(); ++i)
    std::printf("%s%d", i ? " " : "", words[i]);
  std::printf("\n");
  std::printf("ilabels=");
  for (size_t i = 0; i < ilabels.size(); ++i)
    std::printf("%s%d", i ? " " : "", ilabels[i]);
  std::printf("\n");
  // full interleaved best-path arc labels (ilabel:olabel per arc, zeros
  // included) — the reference's AlignTime interpretation derives per-word
  // frame spans from exactly this stream ("each time you see a nonzero
  // ilabel you can interpret that as a frame",
  // ref: src/my-decoder/lattice-faster-decoder.h:129-137)
  {
    std::printf("arcs=");
    StateId s2 = best.Start();
    bool first = true;
    while (true) {
      LatticeState* st = best.GetState(s2);
      if (st == NULL || st->GetArcSize() == 0) break;
      LatticeArc* arc = st->GetArc(0);
      std::printf("%s%d:%d", first ? "" : " ", arc->_input, arc->_output);
      first = false;
      s2 = arc->_to;
    }
    std::printf("\n");
  }

  if (nbest > 0) {
    // the reference's own n-best pipeline (GetNbest, ref:
    // kaldi-online-nnet3-my-decoder.cc:97-105): raw lattice ->
    // lattice determinize (best pdf-seq per word-seq) -> NShortestPath
    // -> split into linear lattices -> word/score extraction
    Lattice raw2, det, nbest_lat;
    if (!decoder.GetRawLattice(&raw2, /*use_final_probs=*/true)) return 0;
    DeterminizeLatticeOptions dopts;
    bool debug = false;
    if (!DeterminizeLatticeWrapper(&raw2, &det, dopts, &debug)) {
      std::printf("nbest=0\n");
      return 0;
    }
    NShortestPath(det, &nbest_lat, (size_t)nbest);
    std::vector<Lattice> paths;
    ConvertNbestToVector(nbest_lat, &paths);
    std::printf("nbest=%d\n", (int)paths.size());
    for (size_t i = 0; i < paths.size(); ++i) {
      std::vector<int> ws, ps;
      float tot = 0, lm = 0;
      if (!LatticeToVector(paths[i], ws, ps, tot, lm)) continue;
      std::printf("nb%d cost=%.6f graph=%.6f words=", (int)i, tot, lm);
      for (size_t j = 0; j < ws.size(); ++j)
        std::printf("%s%d", j ? " " : "", ws[j]);
      std::printf("\n");
    }
  }
  return 0;
}
