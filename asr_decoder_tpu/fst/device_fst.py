"""Device-resident decode graph: degree-bounded split CSR for TPU search.

TPU-first re-design of the reference's arc iteration
(ref: src/newfst/arc-iter.h:10-43, src/my-decoder/online-decoder-base-inl.h:247-352):
instead of per-token pointer walks, the search gathers fixed ``arc_lanes``
arc slots per active token.  To make that exact for states whose out-degree
exceeds the lane count, the graph is rewritten at load time: oversized arc
lists are split across a chain of continuation states linked by weight-0
ε-arcs (an equivalence-preserving WFST transformation).  Emitting and ε arcs
are kept in two separate CSR blocks so ProcessEmitting / ProcessNonemitting
(ref: online-decoder-base-inl.h:247,354) become two masked gather stages.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from asr_decoder_tpu.fst.fst import EPSILON, StdFst


@dataclass
class DeviceFst:
    """Numpy (host) mirror of the device graph; ``to_device()`` uploads.

    Arc ids in the emitting/eps blocks index the *original* ``StdFst`` arc
    array where the arc came from (split-chain ε-arcs get id -1), so lattice
    links recorded on device can be mapped back to source-graph arcs.
    """

    start: int
    final_state: int
    num_states: int
    eps_depth: int
    # maps each (possibly split) device state to the original StdFst state
    # it represents — continuation states inherit their source state's id,
    # so host-side lattice reconstruction can fold them back
    orig_state: np.ndarray   # i32[num_states]
    # emitting block
    em_offset: np.ndarray    # i32[num_states]
    em_count: np.ndarray     # i32[num_states]
    em_ilabel: np.ndarray    # i32[num_em_arcs]
    em_olabel: np.ndarray    # i32[num_em_arcs]
    em_weight: np.ndarray    # f32[num_em_arcs]
    em_dst: np.ndarray       # i32[num_em_arcs]
    em_arcid: np.ndarray     # i32[num_em_arcs]
    # epsilon block
    eps_offset: np.ndarray
    eps_count: np.ndarray
    eps_olabel: np.ndarray
    eps_weight: np.ndarray
    eps_dst: np.ndarray
    eps_arcid: np.ndarray
    # ε-closure block (lazily built by ``build_closure``): for each state s,
    # entries are the *proper* ε-reachable states (s itself is implicit) with
    # their best ε-path weight; ``clo_paths[i]`` is the original-arc-id
    # sequence of entry i's best ε-path (split-chain links dropped).  This
    # turns the reference's per-frame ε worklist (ProcessNonemitting,
    # ref: src/my-decoder/online-decoder-base-inl.h:354-437) into a single
    # precomputed relaxation stage on device.
    clo_offset: np.ndarray | None = None   # i32[num_states]
    clo_count: np.ndarray | None = None    # i32[num_states]
    clo_dst: np.ndarray | None = None      # i32[num_clo]
    clo_weight: np.ndarray | None = None   # f32[num_clo]
    clo_paths: list = field(default_factory=list)  # list[np.ndarray]

    @property
    def max_em_degree(self) -> int:
        return int(self.em_count.max()) if len(self.em_count) else 0

    @property
    def max_eps_degree(self) -> int:
        return int(self.eps_count.max()) if len(self.eps_count) else 0

    @staticmethod
    def build(fst: StdFst, arc_lanes: int = 16) -> "DeviceFst":
        """Split states so no state has more than ``arc_lanes`` emitting arcs
        or more than ``arc_lanes`` ε-arcs (counting the continuation link)."""
        assert arc_lanes >= 2
        if fst.max_out_degree() <= arc_lanes:
            # fast path: no splitting needed — vectorized CSR pack
            return DeviceFst._build_nosplit(fst)
        n = fst.num_states
        src_all = np.repeat(np.arange(n, dtype=np.int64),
                            np.diff(fst.state_offset))
        is_eps = fst.arc_ilabel == EPSILON
        arc_ids = np.arange(fst.num_arcs, dtype=np.int64)

        # mutable per-state arc lists as (ilabel, olabel, weight, dst, arcid)
        em_lists: list[list[tuple]] = [[] for _ in range(n)]
        eps_lists: list[list[tuple]] = [[] for _ in range(n)]
        for a in range(fst.num_arcs):
            rec = (int(fst.arc_ilabel[a]), int(fst.arc_olabel[a]),
                   float(fst.arc_weight[a]), int(fst.arc_dst[a]), int(a))
            (eps_lists if is_eps[a] else em_lists)[int(src_all[a])].append(rec)

        origin = list(range(n))

        def _split(lists_em, lists_eps):
            """Iteratively split any state with > arc_lanes arcs in a block:
            keep the first arc_lanes-1, push the rest to a new continuation
            state reached by a weight-0 ε-arc."""
            s = 0
            while s < len(lists_em):
                for lists, other in ((lists_em, lists_eps),
                                     (lists_eps, lists_em)):
                    if len(lists[s]) > arc_lanes:
                        keep = lists[s][:arc_lanes - 1] if lists is lists_eps \
                            else lists[s][:arc_lanes]
                        rest = lists[s][arc_lanes - 1:] if lists is lists_eps \
                            else lists[s][arc_lanes:]
                        cont = len(lists_em)
                        lists_em.append([])
                        lists_eps.append([])
                        origin.append(origin[s])
                        if lists is lists_eps:
                            lists[s] = keep + [(EPSILON, EPSILON, 0.0, cont, -1)]
                            lists_eps[cont] = rest
                        else:
                            lists[s] = keep
                            lists_em[cont] = rest
                            lists_eps[s] = lists_eps[s] + \
                                [(EPSILON, EPSILON, 0.0, cont, -1)]
                s += 1
            return lists_em, lists_eps

        em_lists, eps_lists = _split(em_lists, eps_lists)
        nn = len(em_lists)

        def _pack(lists, with_ilabel):
            offset = np.zeros(nn, np.int32)
            count = np.zeros(nn, np.int32)
            il, ol, w, dst, aid = [], [], [], [], []
            pos = 0
            for s, arcs in enumerate(lists):
                offset[s] = pos
                count[s] = len(arcs)
                pos += len(arcs)
                for rec in arcs:
                    il.append(rec[0])
                    ol.append(rec[1])
                    w.append(rec[2])
                    dst.append(rec[3])
                    aid.append(rec[4])
            arrs = dict(
                olabel=np.array(ol, np.int32),
                weight=np.array(w, np.float32),
                dst=np.array(dst, np.int32),
                arcid=np.array(aid, np.int32),
            )
            if with_ilabel:
                arrs["ilabel"] = np.array(il, np.int32)
            return offset, count, arrs

        em_off, em_cnt, em = _pack(em_lists, True)
        eps_off, eps_cnt, eps = _pack(eps_lists, False)

        dev = DeviceFst(
            start=fst.start, final_state=fst.final_state, num_states=nn,
            eps_depth=0, orig_state=np.array(origin, np.int32),
            em_offset=em_off, em_count=em_cnt,
            em_ilabel=em["ilabel"], em_olabel=em["olabel"],
            em_weight=em["weight"], em_dst=em["dst"], em_arcid=em["arcid"],
            eps_offset=eps_off, eps_count=eps_cnt,
            eps_olabel=eps["olabel"], eps_weight=eps["weight"],
            eps_dst=eps["dst"], eps_arcid=eps["arcid"])
        dev.eps_depth = dev._compute_eps_depth()
        return dev

    @staticmethod
    def _build_nosplit(fst: StdFst) -> "DeviceFst":
        """Vectorized pack when every state's total out-degree fits the
        lanes (per-block degrees are then ≤ total, so both blocks fit)."""
        n = fst.num_states
        src_all = np.repeat(np.arange(n, dtype=np.int64),
                            np.diff(fst.state_offset))
        is_eps = fst.arc_ilabel == EPSILON
        arc_ids = np.arange(fst.num_arcs, dtype=np.int32)

        def pack(mask):
            src = src_all[mask]
            counts = np.bincount(src, minlength=n).astype(np.int32)
            offsets = np.zeros(n, np.int32)
            np.cumsum(counts[:-1], out=offsets[1:])
            return (offsets, counts, fst.arc_ilabel[mask],
                    fst.arc_olabel[mask], fst.arc_weight[mask],
                    fst.arc_dst[mask], arc_ids[mask])

        # arcs are already grouped by src (CSR) so masking preserves order
        em_off, em_cnt, em_il, em_ol, em_w, em_d, em_id = pack(~is_eps)
        eps_off, eps_cnt, _, eps_ol, eps_w, eps_d, eps_id = pack(is_eps)
        dev = DeviceFst(
            start=fst.start, final_state=fst.final_state, num_states=n,
            eps_depth=0, orig_state=np.arange(n, dtype=np.int32),
            em_offset=em_off, em_count=em_cnt, em_ilabel=em_il,
            em_olabel=em_ol, em_weight=em_w, em_dst=em_d, em_arcid=em_id,
            eps_offset=eps_off, eps_count=eps_cnt, eps_olabel=eps_ol,
            eps_weight=eps_w, eps_dst=eps_d, eps_arcid=eps_id)
        dev.eps_depth = dev._compute_eps_depth()
        return dev

    def _compute_eps_depth(self, max_iters: int = 256) -> int:
        """Longest ε-chain in the (possibly split) graph — the number of
        bounded relaxation sweeps ProcessNonemitting needs per frame.
        Returns -1 if the ε-subgraph is cyclic (sweeps mode then cannot be
        used; the ε-closure table tolerates non-negative ε-cycles)."""
        if len(self.eps_dst) == 0:
            return 0
        esrc = np.repeat(np.arange(self.num_states, dtype=np.int64),
                         self.eps_count)
        edst = self.eps_dst.astype(np.int64)
        depth = np.zeros(self.num_states, np.int64)
        for _ in range(max_iters):
            nd = depth.copy()
            np.maximum.at(nd, edst, depth[esrc] + 1)
            if np.array_equal(nd, depth):
                return int(depth.max())
            depth = nd
        return -1

    @property
    def max_closure_size(self) -> int:
        """Max *proper* closure entries of any state (build_closure first)."""
        assert self.clo_count is not None
        return int(self.clo_count.max()) if len(self.clo_count) else 0

    def build_closure(self) -> None:
        """Precompute per-state ε-closures (Dijkstra over the ε-subgraph).

        closure(s) = every state ε-reachable from s with the Viterbi (min
        total weight) ε-path and that path's original arc ids.  Replaces the
        per-frame ε worklist with one device relaxation stage; exact for any
        ε-subgraph with non-negative weights (ε-cycles allowed — unlike the
        depth-bounded sweep mode).  Idempotent.
        """
        if self.clo_offset is not None:
            return
        n = self.num_states
        if len(self.eps_dst) and float(self.eps_weight.min()) < 0.0:
            raise ValueError("negative epsilon weights: closure unsupported")
        # ε adjacency: src -> [(weight, dst, eps_block_idx)]
        esrc = np.repeat(np.arange(n, dtype=np.int64), self.eps_count)
        adj: dict[int, list[tuple[float, int, int]]] = {}
        for i in range(len(self.eps_dst)):
            adj.setdefault(int(esrc[i]), []).append(
                (float(self.eps_weight[i]), int(self.eps_dst[i]), i))
        offset = np.zeros(n, np.int32)
        count = np.zeros(n, np.int32)
        dsts: list[int] = []
        wts: list[float] = []
        paths: list[np.ndarray] = []
        pos = 0
        for s in range(n):
            offset[s] = pos
            if s not in adj:
                continue
            # Dijkstra from s over ε arcs; pred[d] = (src, eps_idx)
            dist = {s: 0.0}
            pred: dict[int, tuple[int, int]] = {}
            heap = [(0.0, s)]
            while heap:
                c, u = heapq.heappop(heap)
                if c > dist.get(u, np.inf):
                    continue
                for w, v, ei in adj.get(u, ()):
                    nc = c + w
                    if nc < dist.get(v, np.inf):
                        dist[v] = nc
                        pred[v] = (u, ei)
                        heapq.heappush(heap, (nc, v))
            for d in sorted(dist):
                if d == s:
                    continue
                dsts.append(d)
                wts.append(dist[d])
                # reconstruct best ε-path as original arc ids
                path = []
                v = d
                while v != s:
                    u, ei = pred[v]
                    aid = int(self.eps_arcid[ei])
                    if aid >= 0:    # drop split-chain bookkeeping links
                        path.append(aid)
                    v = u
                paths.append(np.array(path[::-1], np.int64))
                pos += 1
            count[s] = pos - offset[s]
        self.clo_offset = offset
        self.clo_count = count
        self.clo_dst = np.array(dsts, np.int32)
        self.clo_weight = np.array(wts, np.float32)
        self.clo_paths = paths

