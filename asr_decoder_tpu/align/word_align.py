"""Word-level time alignment from a best-path arc sequence.

The reference carries per-word time spans to clients as the AlignTime
payload (ref: src/service2/net-data-package.h:210, parsed in the client at
src/client/py-client/asr-client-api.cc:119-126).  This module derives the
spans from the decode best path: walking the arc-id sequence, every arc
with a non-zero input label consumes exactly one scored frame (ref
TraceBackBestPath's "each time you see a nonzero ilabel you can interpret
that as a frame", src/my-decoder/lattice-faster-decoder.h:129-137).

Span convention (word-start anchored): output labels in a decode graph
appear at the first arc of the word's span (composition pushes olabels
early), so word *i* owns the frames from its olabel arc up to (exclusive)
word *i+1*'s olabel arc; the last word extends to the end of the path.
Leading frames before the first word (silence/ε prefix) belong to no word.
"""

from __future__ import annotations

import numpy as np


def word_spans(arc_ids, arc_ilabel: np.ndarray, arc_olabel: np.ndarray,
               frame_offset: int = 0) -> list[tuple[int, int, int]]:
    """[(word_id, begin_frame, end_frame)] for a best-path arc-id sequence.

    ``arc_ilabel``/``arc_olabel`` are the graph's arc label arrays (e.g.
    ``StdFst.arc_ilabel``); frames are counted over arcs with
    ``ilabel != 0`` and offset by ``frame_offset`` (segment base for
    endpoint-resumed streams).  ``end_frame`` is exclusive.
    """
    spans: list[list[int]] = []
    frame = frame_offset
    for a in arc_ids:
        ol = int(arc_olabel[a])
        if ol != 0:
            if spans:
                spans[-1][2] = frame
            spans.append([ol, frame, frame])
        if int(arc_ilabel[a]) != 0:
            frame += 1
    if spans:
        spans[-1][2] = frame
    return [tuple(s) for s in spans]


def spans_to_align(spans, words, seconds_per_frame: float
                   ) -> list[tuple[str, float, float]]:
    """AlignTime payload [(word_text, begin_s, end_s)] from frame spans;
    ``words`` is the output SymbolTable."""
    return [(words.find_word(w), b * seconds_per_frame,
             e * seconds_per_frame) for w, b, e in spans]
