"""VLC (Huffman) table build + decode (reference: libavcodec/bitstream.c:267
ff_init_vlc_sparse, vlc.h:28 VLC, get_bits.h:493 get_vlc2).

The reference builds multi-level lookup tables so one table probe decodes a
whole code. We build the same flat (value, length) table keyed by a
fixed-width prefix; codes longer than the first-level width chain into
sub-tables — identical structure to ff_init_vlc_sparse. The same arrays are
handed to the native C scan decoders (libav_tpu/native) so Python and C
decode share one table representation.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from libav_tpu.avutil.error import AVError, INVALIDDATA


class VLC:
    """Multi-level VLC lookup table.

    table[i] = (value_or_subtable, length); length > 0: code of that many
    bits decodes to value; length < 0: -length further bits index the
    subtable at index `value`; length == 0: invalid code.
    """

    def __init__(self, nb_bits: int,
                 codes: Sequence[int], lengths: Sequence[int],
                 values: Optional[Sequence[int]] = None):
        self.bits = nb_bits
        if values is None:
            values = list(range(len(codes)))
        entries = [(int(l), int(c), int(v))
                   for c, l, v in zip(codes, lengths, values) if l > 0]
        self.table: List[Tuple[int, int]] = []
        self._subtables: List[List[Tuple[int, int]]] = []
        self._build(entries)
        # flattened arrays for the native decoders: one contiguous table,
        # subtables appended after the root with absolute offsets
        self._flatten()

    def _build(self, entries):
        self.table = self._build_level(entries, self.bits, 0)

    def _build_level(self, entries, nb_bits, depth):
        size = 1 << nb_bits
        table: List[Tuple[int, int]] = [(0, 0)] * size
        long_codes = {}
        for length, code, value in entries:
            if length <= nb_bits:
                idx = code << (nb_bits - length)
                for i in range(idx, idx + (1 << (nb_bits - length))):
                    if table[i][1] != 0:
                        raise AVError(INVALIDDATA, "overlapping VLC codes")
                    table[i] = (value, length)
            else:
                prefix = code >> (length - nb_bits)
                long_codes.setdefault(prefix, []).append(
                    (length - nb_bits, code & ((1 << (length - nb_bits)) - 1), value))
        for prefix, subs in long_codes.items():
            sub_bits = min(max(l for l, _, _ in subs), nb_bits)
            sub = self._build_level(subs, sub_bits, depth + 1)
            self._subtables.append(sub)
            table[prefix] = (len(self._subtables) - 1, -sub_bits)
        return table

    def _flatten(self):
        # Layout: [root | sub0 | sub1 | ...]; negative-length entries store
        # the absolute offset of their subtable in `value`.
        offsets = []
        total = len(self.table)
        for sub in self._subtables:
            offsets.append(total)
            total += len(sub)
        flat_v = np.zeros(total, dtype=np.int32)
        flat_l = np.zeros(total, dtype=np.int8)

        def emit(table, base):
            for i, (v, l) in enumerate(table):
                if l < 0:
                    flat_v[base + i] = offsets[v]
                    flat_l[base + i] = l
                else:
                    flat_v[base + i] = v
                    flat_l[base + i] = l

        emit(self.table, 0)
        off = len(self.table)
        for sub in self._subtables:
            emit(sub, off)
            off += len(sub)
        self.flat_values = flat_v
        self.flat_lengths = flat_l

    # ------------------------------------------------------------------ #

    def read(self, gb) -> int:
        """Decode one symbol (reference: get_bits.h:493 get_vlc2);
        follows subtables to any depth (26-bit codes exist in the
        msmpeg4 DC books)."""
        table = self.table
        width = self.bits
        while True:
            idx = gb.show_bits(width)
            v, l = table[idx]
            if l > 0:
                gb.skip_bits(l)
                return v
            if l == 0:
                raise AVError(INVALIDDATA, "invalid VLC code")
            gb.skip_bits(width)
            table = self._subtables[v]
            width = -l


def build_huffman_codes(bits_counts: Sequence[int]) -> List[int]:
    """Canonical Huffman code assignment from per-length counts
    (the JPEG/DHT convention, reference: mjpegdec.c build_vlc /
    jpegtables)."""
    codes = []
    code = 0
    for length in range(1, len(bits_counts) + 1):
        for _ in range(bits_counts[length - 1]):
            codes.append(code)
            code += 1
        code <<= 1
    return codes
