"""Batched frame-synchronous WFST Viterbi beam search on TPU.

This is the TPU-native re-design of the reference decoder's hot loop —
``ProcessEmitting`` / ``ProcessNonemitting`` / ``GetCutoff`` / ``FindOrAddToken``
(ref: src/my-decoder/online-decoder-base-inl.h:139-437).  Where the reference
chases a HashList of token pointers per frame, this implementation keeps a
dense fixed-width token beam per utterance and turns each frame into a few
large gathers, one sort, and one top-k — all batched over utterances and
compiled by XLA into a single fused device program (``lax.scan`` over frames).

Shapes (B = batch of utterances, K = beam width, A = arc lanes, E = ε sweeps):
  * token arrays: ``tok_state i32[B,K]``, ``tok_cost f32[B,K]``
  * emitting expansion: gather ``[B,K,A]`` candidate arcs, add graph weight
    and scaled acoustic cost (the reference's
    ``tot_cost = cost + graph_w − LogLikelihood``, ref inl.h:291-300)
  * relaxation (``FindOrAddToken`` min-merge, ref inl.h:89-137) is a
    sort-by-(dst,cost) + first-of-segment mask — a segmented scatter-min
    without atomics
  * pruning (``GetCutoff`` adaptive beam + max/min-active, ref inl.h:139-245)
    is top-K (max_active ≡ K) plus a beam mask that always keeps the best
    ``min_active`` tokens
  * ε-closure (ref inl.h:354-437 worklist) is E bounded relaxation sweeps,
    E = the graph's exact ε-depth computed at load.

Per-frame backpointers (slot + original arc id, for every stage) are logged
to HBM so the host can reconstruct the best path and lattice links without
device pointer chasing.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from asr_decoder_tpu.decoder.config import DecoderConfig
from asr_decoder_tpu.fst.device_fst import DeviceFst

INF = jnp.inf
NO_STATE = jnp.int32(-1)
BIG_STATE = jnp.int32(2**31 - 1)   # sort key for dead candidates
ARC_STAY = -2                       # log sentinel: token carried, no arc
ARC_EPS_LINK = -1                   # log sentinel: split-chain ε-link


class GraphArrays(NamedTuple):
    """Device-resident graph (all jnp arrays, uploaded once)."""
    em_offset: jax.Array   # i32[S]
    em_count: jax.Array    # i32[S]
    em_pdf: jax.Array      # i32[Aem]  (ilabel pre-mapped to AM output row)
    em_weight: jax.Array   # f32[Aem]
    em_dst: jax.Array      # i32[Aem]
    em_arcid: jax.Array    # i32[Aem]
    eps_offset: jax.Array  # i32[S]
    eps_count: jax.Array   # i32[S]
    eps_weight: jax.Array  # f32[Aeps]
    eps_dst: jax.Array     # i32[Aeps]
    eps_arcid: jax.Array   # i32[Aeps]
    start: jax.Array       # i32 scalar
    final_state: jax.Array # i32 scalar


class BeamState(NamedTuple):
    tok_state: jax.Array   # i32[B,K]
    tok_cost: jax.Array    # f32[B,K]


class FrameLog(NamedTuple):
    """Per-frame search log.

    ``prev_slot``/``arc_id`` are the best-path backpointers per pruning stage
    (host ``traceback`` ≡ ref GetBestPath).  ``tok_state``/``tok_cost`` are
    the post-frame surviving-token snapshots — all the host needs to
    reconstruct the raw lattice exactly (ref GetRawLattice,
    online-decoder-base-inl.h:869-977): the lattice's ForwardLinks are
    re-derivable from the CSR graph + loglikes, so the device never logs
    links (SURVEY §7 'lattice fidelity').
    """
    prev_slot: jax.Array   # i32[stages,B,K]    (advance: [T,stages,B,K])
    arc_id: jax.Array      # i32[stages,B,K]    (advance: [T,stages,B,K])
    tok_state: jax.Array   # i32[B,K]           (advance: [T,B,K])
    tok_cost: jax.Array    # f32[B,K]           (advance: [T,B,K])


def make_graph_arrays(dev: DeviceFst, ilabel2pdf: np.ndarray) -> GraphArrays:
    """Upload a host DeviceFst; ``ilabel2pdf[i]`` maps arc input label i to
    the AM output row scored for it (ref: TransitionIdToPdf /
    ``ilabel-1`` CTC mapping, src/nnet/nnet-nnet.h:212-233)."""
    ilabel2pdf = np.asarray(ilabel2pdf, np.int32)
    em_pdf = ilabel2pdf[dev.em_ilabel]
    return GraphArrays(
        em_offset=jnp.asarray(dev.em_offset),
        em_count=jnp.asarray(dev.em_count),
        em_pdf=jnp.asarray(em_pdf),
        em_weight=jnp.asarray(dev.em_weight),
        em_dst=jnp.asarray(dev.em_dst),
        em_arcid=jnp.asarray(dev.em_arcid),
        eps_offset=jnp.asarray(dev.eps_offset),
        eps_count=jnp.asarray(dev.eps_count),
        eps_weight=jnp.asarray(dev.eps_weight),
        eps_dst=jnp.asarray(dev.eps_dst),
        eps_arcid=jnp.asarray(dev.eps_arcid),
        start=jnp.int32(dev.start),
        final_state=jnp.int32(dev.final_state),
    )


# ----------------------------------------------------------------------
# single-utterance building blocks (vmapped over the batch)
# ----------------------------------------------------------------------

def _relax_and_prune(dst, cost, prev, aid, *, beam_width, beam, min_active):
    """Min-merge candidates by destination state, then prune to the beam.

    The segmented scatter-min: lexicographic sort by (dst, cost); the first
    candidate of each dst segment is that state's best (ties broken by sort
    stability => lowest flat candidate index, mirroring the reference's
    first-writer-wins on exact ties).  Then top-K by cost with an adaptive
    beam mask that never drops the best ``min_active`` tokens
    (ref GetCutoff semantics, online-decoder-base-inl.h:139-245).
    """
    dead = ~jnp.isfinite(cost)
    sort_dst = jnp.where(dead, BIG_STATE, dst)
    sort_dst, cost, prev, aid, dst = jax.lax.sort(
        (sort_dst, cost, prev, aid, dst), num_keys=2, is_stable=True)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sort_dst[1:] != sort_dst[:-1]])
    alive = first & (sort_dst != BIG_STATE)
    cost = jnp.where(alive, cost, INF)
    # top-K by cost (neg for descending top_k)
    neg, idx = jax.lax.top_k(-cost, beam_width)
    cost = -neg
    dst = dst[idx]
    prev = prev[idx]
    aid = aid[idx]
    # adaptive beam: always keep the best min_active slots, beam-prune the rest
    best = cost[0]
    rank = jax.lax.broadcasted_iota(jnp.int32, (beam_width, 1), 0)[:, 0]
    keep = jnp.isfinite(cost) & ((cost <= best + beam) | (rank < min_active))
    cost = jnp.where(keep, cost, INF)
    state = jnp.where(keep, dst, NO_STATE)
    return state, cost, prev, aid


def _expand_emitting(g: GraphArrays, state, cost, loglike, *,
                     arc_lanes, acoustic_scale):
    """Candidate generation for ProcessEmitting (ref inl.h:247-352)."""
    K = state.shape[0]
    valid = state != NO_STATE
    s_safe = jnp.where(valid, state, 0)
    base = g.em_offset[s_safe]                                   # [K]
    cnt = g.em_count[s_safe]
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, arc_lanes), 1)
    amask = valid[:, None] & (lane < cnt[:, None])
    aidx = jnp.where(amask, base[:, None] + lane, 0)
    w = g.em_weight[aidx]
    dst = g.em_dst[aidx]
    aid = g.em_arcid[aidx]
    am = -acoustic_scale * loglike[g.em_pdf[aidx]]
    cand_cost = jnp.where(amask, cost[:, None] + w + am, INF)
    slot = jax.lax.broadcasted_iota(jnp.int32, (K, arc_lanes), 0)
    return (dst.reshape(-1), cand_cost.reshape(-1),
            slot.reshape(-1), aid.reshape(-1))


def _expand_eps(g: GraphArrays, state, cost, *, arc_lanes):
    """Candidate generation for one ε-relaxation sweep: every live token
    stays, plus its ε-successors (ref ProcessNonemitting inl.h:354-437)."""
    K = state.shape[0]
    valid = state != NO_STATE
    s_safe = jnp.where(valid, state, 0)
    base = g.eps_offset[s_safe]
    cnt = g.eps_count[s_safe]
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, arc_lanes), 1)
    amask = valid[:, None] & (lane < cnt[:, None])
    aidx = jnp.where(amask, base[:, None] + lane, 0)
    w = g.eps_weight[aidx]
    dst = g.eps_dst[aidx]
    aid = g.eps_arcid[aidx]
    move_cost = jnp.where(amask, cost[:, None] + w, INF)
    slot = jax.lax.broadcasted_iota(jnp.int32, (K, arc_lanes), 0)
    # stay candidates keep the token as-is
    stay_dst = jnp.where(valid, state, BIG_STATE)
    stay_slot = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)[:, 0]
    stay_aid = jnp.full((K,), ARC_STAY, jnp.int32)
    return (jnp.concatenate([stay_dst, dst.reshape(-1)]),
            jnp.concatenate([cost, move_cost.reshape(-1)]),
            jnp.concatenate([stay_slot, slot.reshape(-1)]),
            jnp.concatenate([stay_aid, aid.reshape(-1)]))


def _eps_closure(g: GraphArrays, state, cost, *, cfg_static):
    """E bounded sweeps; returns final tokens + per-sweep logs [E,K]."""
    K, A, E = cfg_static["K"], cfg_static["A"], cfg_static["E"]
    logs_prev, logs_aid = [], []
    for _ in range(E):
        cand = _expand_eps(g, state, cost, arc_lanes=A)
        state, cost, prev, aid = _relax_and_prune(
            *cand, beam_width=K, beam=cfg_static["beam"],
            min_active=cfg_static["min_active"])
        logs_prev.append(prev)
        logs_aid.append(aid)
    if E:
        log = (jnp.stack(logs_prev), jnp.stack(logs_aid))
    else:
        log = (jnp.zeros((0, K), jnp.int32), jnp.zeros((0, K), jnp.int32))
    return state, cost, log


def _frame_step(g: GraphArrays, state, cost, loglike, *, cfg_static):
    """One decode frame: emitting expansion then ε-closure; returns logs
    [1+E, K] (stage 0 = emitting, referencing previous-frame slots)."""
    cand = _expand_emitting(
        g, state, cost, loglike, arc_lanes=cfg_static["A"],
        acoustic_scale=cfg_static["acoustic_scale"])
    state, cost, prev0, aid0 = _relax_and_prune(
        *cand, beam_width=cfg_static["K"], beam=cfg_static["beam"],
        min_active=cfg_static["min_active"])
    state, cost, (eprev, eaid) = _eps_closure(g, state, cost,
                                              cfg_static=cfg_static)
    prev = jnp.concatenate([prev0[None], eprev], axis=0)
    aid = jnp.concatenate([aid0[None], eaid], axis=0)
    return state, cost, prev, aid


# ----------------------------------------------------------------------
# jitted entry points — module-level and keyed only by the static config +
# array shapes, so decoders over different graphs share compilations
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2))
def _init_fn(g: GraphArrays, batch: int, static_cfg: tuple):
    cfg = dict(static_cfg)
    K = cfg["K"]
    state = jnp.full((batch, K), NO_STATE, jnp.int32)
    cost = jnp.full((batch, K), INF, jnp.float32)
    state = state.at[:, 0].set(g.start)
    cost = cost.at[:, 0].set(0.0)
    closure = jax.vmap(lambda s, c: _eps_closure(g, s, c, cfg_static=cfg))
    state, cost, (prev, aid) = closure(state, cost)
    return BeamState(state, cost), FrameLog(
        jnp.swapaxes(prev, 0, 1), jnp.swapaxes(aid, 0, 1), state, cost)


@partial(jax.jit, static_argnums=(3,))
def _advance_fn(g: GraphArrays, state: BeamState, inputs, static_cfg: tuple):
    cfg = dict(static_cfg)
    loglikes, frame_mask = inputs

    def scan_body(carry, xs):
        st, co = carry
        ll, mask = xs                              # [B,V], [B]
        step = jax.vmap(
            lambda s, c, l: _frame_step(g, s, c, l, cfg_static=cfg))
        ns, nc, prev, aid = step(st, co, ll)       # prev/aid: [B,S,K]
        K = cfg["K"]
        slot_id = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2), prev.shape)
        m = mask[:, None]
        ns = jnp.where(m, ns, st)
        nc = jnp.where(m, nc, co)
        m3 = mask[:, None, None]
        prev = jnp.where(m3, prev, slot_id)
        aid = jnp.where(m3, aid, ARC_STAY)
        return (ns, nc), (jnp.swapaxes(prev, 0, 1),
                          jnp.swapaxes(aid, 0, 1), ns, nc)

    lls = jnp.swapaxes(loglikes, 0, 1)             # [T,B,V]
    masks = jnp.swapaxes(frame_mask, 0, 1)         # [T,B]
    (st, co), (prevs, aids, toks, costs) = jax.lax.scan(
        scan_body, (state.tok_state, state.tok_cost), (lls, masks))
    # logs: prev/aid [T,S,B,K]; token snapshots [T,B,K]
    return BeamState(st, co), FrameLog(prevs, aids, toks, costs)


class TpuBeamSearch:
    """Jit-compiled batched beam-search decoder over a fixed graph.

    Equivalent surface to the reference ``DecoderItf``
    (ref: src/my-decoder/decoder-itf.h:10-25): ``init_state`` ≡ InitDecoding,
    ``advance`` ≡ AdvanceDecoding (a chunk of frames), host ``traceback``
    ≡ GetBestPath.
    """

    def __init__(self, dev: DeviceFst, ilabel2pdf: np.ndarray,
                 config: DecoderConfig | None = None):
        self.config = config or DecoderConfig()
        self.config.check()
        self.dev = dev
        self._ilabel2pdf = np.asarray(ilabel2pdf, np.int32)
        self.graph = make_graph_arrays(dev, ilabel2pdf)
        eps_iters = self.config.eps_iters or dev.eps_depth
        assert dev.max_em_degree <= self.config.arc_lanes, \
            "graph not degree-bounded: rebuild DeviceFst with arc_lanes"
        assert dev.max_eps_degree <= self.config.arc_lanes
        self._static = tuple(sorted(dict(
            K=self.config.beam_width,
            A=self.config.arc_lanes,
            E=eps_iters,
            beam=float(self.config.beam),
            min_active=int(self.config.min_active),
            acoustic_scale=float(self.config.acoustic_scale),
        ).items()))
        self.num_stages = 1 + eps_iters

    # -- InitDecoding ------------------------------------------------------
    def init_state(self, batch: int) -> tuple[BeamState, FrameLog]:
        return _init_fn(self.graph, batch, self._static)

    # -- AdvanceDecoding over a chunk of frames ----------------------------
    def advance(self, state: BeamState, loglikes, frame_mask=None):
        """loglikes f32[B,T,V]; frame_mask bool[B,T] (False = padding)."""
        loglikes = jnp.asarray(loglikes, jnp.float32)
        B, T, _ = loglikes.shape
        if frame_mask is None:
            frame_mask = jnp.ones((B, T), bool)
        return _advance_fn(self.graph, state,
                           (loglikes, jnp.asarray(frame_mask)), self._static)

    def decode(self, loglikes, frame_mask=None):
        """Full utterance decode: init + advance.  Returns
        (final BeamState, init FrameLog, frame FrameLogs)."""
        B = loglikes.shape[0]
        state, init_log = self.init_state(B)
        state, logs = self.advance(state, loglikes, frame_mask)
        return state, init_log, logs

    # -- host-side raw lattice (ref GetRawLattice inl.h:869-977) -----------
    def token_sets(self, init_log: FrameLog, logs: FrameLog, b: int,
                   num_frames: int | None = None) -> list[dict[int, float]]:
        """Per-frame surviving-token sets {orig_state: cost} for utterance
        ``b``, folding split continuation states back to their source state
        (they are ε-0 copies, so min-merge is exact)."""
        orig = self.dev.orig_state
        T = logs.tok_state.shape[0]
        if num_frames is None:
            num_frames = T
        out = []
        snaps = [(np.asarray(init_log.tok_state[b]),
                  np.asarray(init_log.tok_cost[b]))]
        snaps += [(np.asarray(logs.tok_state[t, b]),
                   np.asarray(logs.tok_cost[t, b]))
                  for t in range(num_frames)]
        for st, co in snaps:
            ok = (st >= 0) & np.isfinite(co)
            toks: dict[int, float] = {}
            for s, c in zip(orig[st[ok]], co[ok]):
                s = int(s)
                c = float(c)
                if c < toks.get(s, np.inf):
                    toks[s] = c
            out.append(toks)
        return out

    def get_lattices(self, init_log: FrameLog, logs: FrameLog,
                     loglikes, fst, frame_mask=None):
        """Reconstruct pruned raw lattices for every utterance from the
        device token snapshots (see decoder/raw_lattice.py).  ``fst`` is the
        source StdFst; ``loglikes`` f32[B,T,V] as given to ``advance``."""
        from asr_decoder_tpu.decoder.raw_lattice import \
            lattice_from_token_sets
        loglikes = np.asarray(loglikes)
        B, T = loglikes.shape[:2]
        lens = (np.asarray(frame_mask).sum(axis=1).astype(int)
                if frame_mask is not None else np.full(B, T))
        i2p = np.asarray(self._ilabel2pdf, np.int64)
        return [lattice_from_token_sets(
                    fst, self.token_sets(init_log, logs, b, int(lens[b])),
                    loglikes[b, :int(lens[b])], i2p, self.config)
                for b in range(B)]

    # -- host-side best path (ref GetBestPath / TraceBackBestPath,
    #    online-decoder-base-inl.h:1072-1161) ------------------------------
    def traceback(self, state: BeamState, init_log: FrameLog,
                  logs: FrameLog, fst_arcs=None):
        """Returns per-utterance dicts with arc ids, words, ilabels, cost.

        ``fst_arcs``: the source StdFst (for olabel/ilabel lookup); if None,
        only arc ids and cost are returned.
        """
        tok_state = np.asarray(state.tok_state)
        tok_cost = np.asarray(state.tok_cost)
        prevs = np.asarray(logs.prev_slot)   # [T,S,B,K]
        aids = np.asarray(logs.arc_id)
        iprev = np.asarray(init_log.prev_slot)  # [E,B,K]
        iaid = np.asarray(init_log.arc_id)
        T = prevs.shape[0]
        final_id = int(self.dev.final_state)
        results = []
        for b in range(tok_state.shape[0]):
            # prefer the super-final token; else the best live token
            finals = np.where(tok_state[b] == final_id)[0]
            if len(finals):
                slot = int(finals[np.argmin(tok_cost[b][finals])])
                reached_final = True
            else:
                slot = int(np.argmin(tok_cost[b]))
                reached_final = False
            total = float(tok_cost[b, slot])
            arcs_rev: list[int] = []
            for t in range(T - 1, -1, -1):
                for s in range(prevs.shape[1] - 1, -1, -1):
                    a = int(aids[t, s, b, slot])
                    if a >= 0:
                        arcs_rev.append(a)
                    slot = int(prevs[t, s, b, slot])
            for s in range(iprev.shape[0] - 1, -1, -1):
                a = int(iaid[s, b, slot])
                if a >= 0:
                    arcs_rev.append(a)
                slot = int(iprev[s, b, slot])
            arc_ids = arcs_rev[::-1]
            res = dict(arc_ids=arc_ids, cost=total,
                       reached_final=reached_final)
            if fst_arcs is not None:
                ol = fst_arcs.arc_olabel[arc_ids]
                il = fst_arcs.arc_ilabel[arc_ids]
                res["words"] = [int(x) for x in ol[ol != 0]]
                res["ilabels"] = [int(x) for x in il[il != 0]]
            results.append(res)
        return results
