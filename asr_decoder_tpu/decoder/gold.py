"""Host reference decoder: exact token-passing beam search with lattices.

This is the framework's semantic gold standard — a clean-room numpy/Python
implementation of the capability of the reference's
``OnlineLatticeDecoderBase`` (ref: src/my-decoder/online-decoder-base.h,
online-decoder-base-inl.h): frame-synchronous Viterbi over the CSR graph with
beam + max/min-active pruning, exact ε-closure, ForwardLink recording, raw
lattice extraction with lattice-beam extra-cost pruning (ref PruneForwardLinks
inl.h:483-577, GetRawLattice :869-977), and best path.

It defines the semantics the TPU kernel (`ops/beamsearch.py`) must match:
per-frame order = emitting expansion → prune → ε-closure → prune, with
pruning = "beam margin over best, capped at max_active, never below
min_active".  (The reference's *adaptive* cutoff estimation, inl.h:139-245,
is a work-saving heuristic around the same semantics.)

It is deliberately simple and slow — used for parity tests and as the
host-side lattice builder until the device link-log path lands.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from asr_decoder_tpu.decoder.config import DecoderConfig
from asr_decoder_tpu.fst.fst import EPSILON, StdFst
from asr_decoder_tpu.fst.lattice import Lattice, LatticeArc
from asr_decoder_tpu.fst.semiring import INF, LatticeWeight

# link: (src_frame, src_state, ilabel, olabel, graph_cost, am_cost)
_Link = tuple[int, int, int, int, float, float]


@dataclass
class GoldResult:
    words: list[int]
    ilabels: list[int]
    cost: float
    reached_final: bool
    lattice: Lattice | None = None


class GoldDecoder:
    """Single-utterance offline decode over precomputed log-likelihoods."""

    def __init__(self, fst: StdFst, ilabel2pdf: np.ndarray,
                 config: DecoderConfig | None = None):
        self.fst = fst
        self.ilabel2pdf = np.asarray(ilabel2pdf, np.int64)
        self.config = config or DecoderConfig()

    # -- pruning with the dense-search semantics --------------------------
    def _prune(self, toks: dict[int, float]) -> dict[int, float]:
        cfg = self.config
        if not toks:
            return toks
        costs = np.array(list(toks.values()))
        best = costs.min()
        order = np.sort(costs)
        cap = min(cfg.max_active, cfg.beam_width)
        cutoff = best + cfg.beam
        if len(order) > cap:
            cutoff = min(cutoff, float(order[cap - 1]))
        if cfg.min_active > 0 and len(order) > cfg.min_active:
            cutoff = max(cutoff, float(order[cfg.min_active - 1]))
        return {s: c for s, c in toks.items() if c <= cutoff}

    def _eps_closure(self, toks: dict[int, float],
                     frame: int, links: list[_Link] | None):
        """Exact ε-closure by worklist relaxation
        (ref ProcessNonemitting, inl.h:354-437)."""
        fst = self.fst
        work = list(toks)
        while work:
            s = work.pop()
            c = toks[s]
            lo, hi = int(fst.state_offset[s]), int(fst.state_eps_end[s])
            for i in range(lo, hi):
                d = int(fst.arc_dst[i])
                w = float(fst.arc_weight[i])
                ol = int(fst.arc_olabel[i])
                if links is not None:
                    links.append((frame, s, EPSILON, ol, w, 0.0,
                                  int(fst.arc_dst[i])))
                nc = c + w
                if nc < toks.get(d, INF):
                    toks[d] = nc
                    work.append(d)
        return toks

    def decode(self, loglikes: np.ndarray,
               want_lattice: bool = True) -> GoldResult:
        """loglikes: f32[T, V] acoustic log-likelihood rows."""
        fst = self.fst
        cfg = self.config
        scale = cfg.acoustic_scale
        T = loglikes.shape[0]

        # frame_links[t] = links generated while producing frame-t tokens
        frame_links: list[list] = [[] for _ in range(T + 1)]
        frame_toks: list[dict[int, float]] = []

        toks = {int(fst.start): 0.0}
        self._eps_closure(toks, 0, frame_links[0] if want_lattice else None)
        toks = self._prune(toks)
        frame_toks.append(dict(toks))

        for t in range(T):
            ll = loglikes[t]
            new: dict[int, float] = {}
            links = frame_links[t + 1] if want_lattice else None
            for s, c in toks.items():
                lo = int(fst.state_eps_end[s])
                hi = int(fst.state_offset[s + 1])
                for i in range(lo, hi):
                    il = int(fst.arc_ilabel[i])
                    am = -scale * float(ll[self.ilabel2pdf[il]])
                    w = float(fst.arc_weight[i])
                    d = int(fst.arc_dst[i])
                    if links is not None:
                        links.append((t, s, il, int(fst.arc_olabel[i]),
                                      w, am, d))
                    nc = c + w + am
                    if nc < new.get(d, INF):
                        new[d] = nc
            new = self._prune(new)
            self._eps_closure(new, t + 1, links)
            new = self._prune(new)
            frame_toks.append(dict(new))
            toks = new

        final_id = fst.final_state
        if final_id in toks:
            best_cost = toks[final_id]
            reached = True
        else:
            best_cost = min(toks.values()) if toks else INF
            reached = False

        lattice = None
        if want_lattice:
            lattice = self._build_lattice(frame_toks, frame_links, T)
        words, ilabels = [], []
        if lattice is not None:
            words, ilabels, _, _ = lattice.to_vector()
        return GoldResult(words=words, ilabels=ilabels, cost=float(best_cost),
                          reached_final=reached, lattice=lattice)

    # -- raw lattice (ref GetRawLattice inl.h:869-977 + PruneForwardLinks
    #    extra-cost semantics :483-577, applied once offline) --------------
    def _build_lattice(self, frame_toks, frame_links, T) -> Lattice | None:
        cfg = self.config
        fst = self.fst
        final_id = fst.final_state

        # node = (frame, state) for tokens that survived pruning
        alpha: dict[tuple[int, int], float] = {}
        for t, toks in enumerate(frame_toks):
            for s, c in toks.items():
                alpha[(t, s)] = c
        # valid links: endpoints must both be surviving tokens
        # emitting links recorded as (src_frame=t, ...) produce dst at t+1;
        # eps links have src_frame == dst frame
        edges: dict[tuple[int, int], list] = {}
        redges: dict[tuple[int, int], list] = {}
        for t in range(T + 1):
            for (sf, ss, il, ol, gw, am, d) in frame_links[t]:
                df = t
                src = (sf, ss)
                dst = (df, d)
                if src in alpha and dst in alpha:
                    edges.setdefault(src, []).append((dst, il, ol, gw, am))
                    redges.setdefault(dst, []).append((src, gw + am))

        finals = [(T, final_id)] if (T, final_id) in alpha else []
        if not finals:
            # fall back: all last-frame tokens final with zero weight
            # (reference ComputeFinalCosts falls back to best cost,
            #  inl.h:671-724)
            finals = [(T, s) for s in frame_toks[T]]
        if not finals:
            return None

        # backward best-cost-to-final (beta) over the token DAG
        beta: dict[tuple[int, int], float] = {f: 0.0 for f in finals}
        # process nodes in reverse topological order: by (frame desc);
        # within a frame, eps edges go forward in eps-DAG order — iterate to
        # convergence within frame (eps graphs are shallow)
        nodes_by_frame: dict[int, list] = {}
        for n in alpha:
            nodes_by_frame.setdefault(n[0], []).append(n)
        for t in range(T, -1, -1):
            changed = True
            while changed:
                changed = False
                for n in nodes_by_frame.get(t, []):
                    for (dst, il, ol, gw, am) in edges.get(n, []):
                        if dst in beta:
                            nb = gw + am + beta[dst]
                            if nb < beta.get(n, INF):
                                beta[n] = nb
                                changed = True

        best_total = min((alpha[f] + 0.0 for f in finals
                          if f in alpha), default=INF)
        best_total = min((alpha[n] + beta[n] for n in beta), default=best_total)

        lat = Lattice()
        ids: dict[tuple[int, int], int] = {}

        def node_id(n):
            if n not in ids:
                ids[n] = lat.add_state()
            return ids[n]

        kept = {n for n in alpha
                if n in beta and alpha[n] + beta[n] <= best_total +
                cfg.lattice_beam}
        for n in kept:
            ni = node_id(n)
            for (dst, il, ol, gw, am) in edges.get(n, []):
                if dst in kept:
                    extra = alpha[n] + gw + am + beta[dst] - best_total
                    if extra <= cfg.lattice_beam:
                        lat.add_arc(ni, LatticeArc(
                            il, ol, LatticeWeight(gw, am), node_id(dst)))
        start_node = (0, int(self.fst.start))
        if start_node not in kept:
            # start may have been eps-merged away; use best frame-0 node
            cands = [n for n in kept if n[0] == 0]
            if not cands:
                return None
            start_node = min(cands, key=lambda n: alpha[n])
        lat.set_start(node_id(start_node))
        for f in finals:
            if f in kept:
                lat.set_final(node_id(f))
        lat.connect()
        return lat
