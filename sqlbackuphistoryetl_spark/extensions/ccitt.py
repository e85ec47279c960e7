"""CCITT fax codings for bilevel TIFF: Modified Huffman and Group 4 (r10).

The sub-byte TIFF work (r10) decodes bilevel rasters, but real
archival scans — patent files, book scans, microfilm digitization —
almost universally compress them with the CCITT fax codings TIFF
carries as Compression 2 (Modified Huffman, the T.4 one-dimensional
code without EOLs, each row padded to a byte edge), Compression 3
(Group 3 proper: EOL-delimited rows, T4Options selecting 1-D or
mixed 1-D/2-D "MR" coding and byte-aligned EOLs) and Compression 4
(ITU T.6 "Group 4" MMR, pure two-dimensional coding against the
previous row, no EOLs). This module implements all three, from the
public ITU T.4/T.6 specifications, stdlib-only:

- the T.4 white/black terminating (0-63) and make-up (64-1728) run
  codes plus the shared extended make-ups (1792-2560), used directly
  by MH rows and inside G4 horizontal mode;
- G4 vertical (V0, VR1-3, VL1-3), pass, and horizontal modes over
  changing-element lists, with the imaginary all-white reference line
  starting each block (TIFF resets the 2D history per strip/tile);
- encoders for both codings (greedy standard mode selection for G4),
  so round trips pin the tables and the changing-element arithmetic
  without binary fixtures, plus hand-computed short-code vectors that
  pin the table values themselves against the spec.

Run semantics follow fax convention: bit 1 = black. The decoders
return MSB-first bit-packed rows (stride ``(width+7)//8``) — exactly
the "decompressed chunk" shape :mod:`.tiff_codec`'s bilevel strip
path expands with ``png_codec._unpack_bits``, so photometric 0/1
handling stays in one place. Corrupt streams raise
:class:`CCITTError`; all loops are bounded by the declared geometry
(a run can never write past its row, rows never exceed the block), so
hostile input terminates by construction.
"""

from __future__ import annotations

CCITT_MAX_RUN = 2560


class CCITTError(ValueError):
    """Structurally corrupt CCITT-coded stream."""


# --------------------------------------------------------------- T.4 tables
# (run_length, code_as_bit_string); transcribed from ITU-T T.4. The
# encoder/decoder round trips prove self-consistency; the short-code
# vectors in tests/test_ccitt.py pin the values against the spec.

_WHITE_CODES = [
    (0, "00110101"), (1, "000111"), (2, "0111"), (3, "1000"),
    (4, "1011"), (5, "1100"), (6, "1110"), (7, "1111"),
    (8, "10011"), (9, "10100"), (10, "00111"), (11, "01000"),
    (12, "001000"), (13, "000011"), (14, "110100"), (15, "110101"),
    (16, "101010"), (17, "101011"), (18, "0100111"), (19, "0001100"),
    (20, "0001000"), (21, "0010111"), (22, "0000011"), (23, "0000100"),
    (24, "0101000"), (25, "0101011"), (26, "0010011"), (27, "0100100"),
    (28, "0011000"), (29, "00000010"), (30, "00000011"), (31, "00011010"),
    (32, "00011011"), (33, "00010010"), (34, "00010011"), (35, "00010100"),
    (36, "00010101"), (37, "00010110"), (38, "00010111"), (39, "00101000"),
    (40, "00101001"), (41, "00101010"), (42, "00101011"), (43, "00101100"),
    (44, "00101101"), (45, "00000100"), (46, "00000101"), (47, "00001010"),
    (48, "00001011"), (49, "01010010"), (50, "01010011"), (51, "01010100"),
    (52, "01010101"), (53, "00100100"), (54, "00100101"), (55, "01011000"),
    (56, "01011001"), (57, "01011010"), (58, "01011011"), (59, "01001010"),
    (60, "01001011"), (61, "00110010"), (62, "00110011"), (63, "00110100"),
    # make-up codes
    (64, "11011"), (128, "10010"), (192, "010111"), (256, "0110111"),
    (320, "00110110"), (384, "00110111"), (448, "01100100"),
    (512, "01100101"), (576, "01101000"), (640, "01100111"),
    (704, "011001100"), (768, "011001101"), (832, "011010010"),
    (896, "011010011"), (960, "011010100"), (1024, "011010101"),
    (1088, "011010110"), (1152, "011010111"), (1216, "011011000"),
    (1280, "011011001"), (1344, "011011010"), (1408, "011011011"),
    (1472, "010011000"), (1536, "010011001"), (1600, "010011010"),
    (1664, "011000"), (1728, "010011011"),
]

_BLACK_CODES = [
    (0, "0000110111"), (1, "010"), (2, "11"), (3, "10"),
    (4, "011"), (5, "0011"), (6, "0010"), (7, "00011"),
    (8, "000101"), (9, "000100"), (10, "0000100"), (11, "0000101"),
    (12, "0000111"), (13, "00000100"), (14, "00000111"),
    (15, "000011000"), (16, "0000010111"), (17, "0000011000"),
    (18, "0000001000"), (19, "00001100111"), (20, "00001101000"),
    (21, "00001101100"), (22, "00000110111"), (23, "00000101000"),
    (24, "00000010111"), (25, "00000011000"), (26, "000011001010"),
    (27, "000011001011"), (28, "000011001100"), (29, "000011001101"),
    (30, "000001101000"), (31, "000001101001"), (32, "000001101010"),
    (33, "000001101011"), (34, "000011010010"), (35, "000011010011"),
    (36, "000011010100"), (37, "000011010101"), (38, "000011010110"),
    (39, "000011010111"), (40, "000001101100"), (41, "000001101101"),
    (42, "000011011010"), (43, "000011011011"), (44, "000001010100"),
    (45, "000001010101"), (46, "000001010110"), (47, "000001010111"),
    (48, "000001100100"), (49, "000001100101"), (50, "000001010010"),
    (51, "000001010011"), (52, "000000100100"), (53, "000000110111"),
    (54, "000000111000"), (55, "000000100111"), (56, "000000101000"),
    (57, "000001011000"), (58, "000001011001"), (59, "000000101011"),
    (60, "000000101100"), (61, "000001011010"), (62, "000001100110"),
    (63, "000001100111"),
    # make-up codes
    (64, "0000001111"), (128, "000011001000"), (192, "000011001001"),
    (256, "000001011011"), (320, "000000110011"), (384, "000000110100"),
    (448, "000000110101"), (512, "0000001101100"), (576, "0000001101101"),
    (640, "0000001001010"), (704, "0000001001011"), (768, "0000001001100"),
    (832, "0000001001101"), (896, "0000001110010"), (960, "0000001110011"),
    (1024, "0000001110100"), (1088, "0000001110101"),
    (1152, "0000001110110"), (1216, "0000001110111"),
    (1280, "0000001010010"), (1344, "0000001010011"),
    (1408, "0000001010100"), (1472, "0000001010101"),
    (1536, "0000001011010"), (1600, "0000001011011"),
    (1664, "0000001100100"), (1728, "0000001100101"),
]

#: extended make-ups 1792-2560, shared by both colors (T.4 §2)
_EXT_CODES = [
    (1792, "00000001000"), (1856, "00000001100"), (1920, "00000001101"),
    (1984, "000000010010"), (2048, "000000010011"), (2112, "000000010100"),
    (2176, "000000010101"), (2240, "000000010110"), (2304, "000000010111"),
    (2368, "000000011100"), (2432, "000000011101"), (2496, "000000011110"),
    (2560, "000000011111"),
]

# G4 / T.6 two-dimensional mode codes
_MODE_CODES = [
    ("P", "0001"), ("H", "001"), ("V0", "1"),
    ("VR1", "011"), ("VR2", "000011"), ("VR3", "0000011"),
    ("VL1", "010"), ("VL2", "000010"), ("VL3", "0000010"),
]


def _decode_table(pairs):
    return {(len(code), int(code, 2)): run for run, code in pairs}


def _encode_table(pairs):
    return {run: (int(code, 2), len(code)) for run, code in pairs}


_WHITE_DEC = _decode_table(_WHITE_CODES + _EXT_CODES)
_BLACK_DEC = _decode_table(_BLACK_CODES + _EXT_CODES)
_WHITE_ENC = _encode_table(_WHITE_CODES + _EXT_CODES)
_BLACK_ENC = _encode_table(_BLACK_CODES + _EXT_CODES)
_MODE_DEC = {(len(code), int(code, 2)): mode for mode, code in _MODE_CODES}
_MODE_ENC = {mode: (int(code, 2), len(code)) for mode, code in _MODE_CODES}
_MAX_CODE_BITS = 14  # longest T.4 code is 13 bits; one of slack


class _BitReader:
    """MSB-first bit reader over a bytes buffer."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos

    def read_code(self, table) -> object:
        """Longest-prefix decode against a {(nbits, value): out} table."""
        acc = 0
        for n in range(1, _MAX_CODE_BITS + 1):
            if self.pos >= len(self.data) * 8:
                raise CCITTError("code runs past end of stream")
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            self.pos += 1
            acc = (acc << 1) | bit
            out = table.get((n, acc))
            if out is not None:
                return out
        raise CCITTError("no such code (corrupt stream)")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | value
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        out = bytearray(self.out)
        if self.nacc:
            out.append((self.acc << (8 - self.nacc)) & 0xFF)
        return bytes(out)


def _read_run(rd: _BitReader, table, limit: int) -> int:
    """One complete run: make-up codes (>= 64) accumulate until a
    terminating code (< 64) closes the run (T.4 §2.4.1.1)."""
    total = 0
    while True:
        run = rd.read_code(table)
        total += run
        if total > limit:
            raise CCITTError("run exceeds row width")
        if run < 64:
            return total


def _write_run(wr: _BitWriter, table, run: int) -> None:
    while run >= 64:
        step = min((run // 64) * 64, CCITT_MAX_RUN)
        if run - step == 0 and step > 64 and step not in table:
            step -= 64  # pragma: no cover (all multiples are in-table)
        v, n = table[step]
        wr.write(v, n)
        run -= step
    v, n = table[run]
    wr.write(v, n)


def _changes_of_row(row: bytes) -> list[int]:
    """Positions where the color changes (row is 0/1 per pixel,
    starting from imaginary white before position 0)."""
    out = []
    prev = 0
    for x, v in enumerate(row):
        if v != prev:
            out.append(x)
            prev = v
    return out


def _pack_bits_row(row: list[int] | bytes) -> bytes:
    stride = (len(row) + 7) // 8
    out = bytearray(stride)
    for x, v in enumerate(row):
        if v:
            out[x >> 3] |= 0x80 >> (x & 7)
    return bytes(out)


def _runs_to_packed(runs: list[tuple[int, int]], width: int) -> bytes:
    """[(start, end) black spans] → packed MSB-first row."""
    out = bytearray((width + 7) // 8)
    for s, e in runs:
        for x in range(s, e):
            out[x >> 3] |= 0x80 >> (x & 7)
    return bytes(out)


# ------------------------------------------------------------------ MH (comp 2)


def decode_mh(data: bytes, width: int, height: int) -> bytes:
    """TIFF Compression 2: each row is an independent T.4 1-D code
    sequence, starting white, padded to a byte boundary — no EOLs."""
    rd = _BitReader(data)
    stride = (width + 7) // 8
    out = bytearray(stride * height)
    for y in range(height):
        rd.align()
        x = 0
        black = []
        color_white = True
        while x < width:
            run = _read_run(
                rd, _WHITE_DEC if color_white else _BLACK_DEC, width - x
            )
            if not color_white and run:
                black.append((x, x + run))
            x += run
            color_white = not color_white
        out[y * stride : (y + 1) * stride] = _runs_to_packed(black, width)
    return bytes(out)


def encode_mh(rows: list[bytes], width: int) -> bytes:
    """Inverse of :func:`decode_mh`; ``rows`` are 0/1-per-pixel."""
    wr = _BitWriter()
    for row in rows:
        if len(row) != width:
            raise ValueError("row length disagrees with width")
        wr.align()
        x = 0
        color_white = True
        while x < width:
            run = 0
            want = 0 if color_white else 1
            while x + run < width and row[x + run] == want:
                run += 1
            _write_run(wr, _WHITE_ENC if color_white else _BLACK_ENC, run)
            x += run
            color_white = not color_white
            if x >= width:
                break
        # T.4 rows always END on a coded run; if the row ends on a
        # color with zero remaining pixels nothing more is needed
    return wr.bytes()


# ------------------------------------------------------------------ G4 (comp 4)


def _b1_b2(ref_changes: list[int], a0: int, color_white: bool) -> tuple[int, int]:
    """The first changing element on the reference line strictly right
    of a0 with the opposite color of a0's color, and the next one.
    Changes alternate white→black (even index) / black→white (odd);
    when the current color is white b1 must be a white→black change."""
    import bisect

    i = bisect.bisect_right(ref_changes, a0)
    # parity fix: white→black changes sit at even indices
    want_even = color_white
    if i < len(ref_changes) and (i % 2 == 0) != want_even:
        i += 1
    b1 = ref_changes[i] if i < len(ref_changes) else -1
    b2 = ref_changes[i + 1] if i + 1 < len(ref_changes) else -1
    return b1, b2


def _decode_2d_row(rd: _BitReader, ref_changes: list[int], width: int):
    """One T.4-2D / T.6 coded row against its reference line.
    Returns (black_spans, new_ref_changes)."""
    cur_changes: list[int] = []
    black: list[tuple[int, int]] = []
    a0 = -1
    color_white = True
    while a0 < width:
        b1, b2 = _b1_b2(ref_changes, a0, color_white)
        if b1 < 0:
            b1 = width
        if b2 < 0:
            b2 = width
        mode = rd.read_code(_MODE_DEC)
        start = max(a0, 0)
        if mode == "P":
            if not color_white:
                black.append((start, min(b2, width)))
            a0 = b2
        elif mode == "H":
            r1 = _read_run(
                rd, _WHITE_DEC if color_white else _BLACK_DEC,
                width - start,
            )
            r2 = _read_run(
                rd, _BLACK_DEC if color_white else _WHITE_DEC,
                width - start - r1,
            )
            if color_white:
                black.append((start + r1, start + r1 + r2))
            else:
                black.append((start, start + r1))
            cur_changes.append(start + r1)
            cur_changes.append(start + r1 + r2)
            a0 = start + r1 + r2
        else:  # vertical
            delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                     "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = b1 + delta
            if a1 < 0 or a1 > width:
                raise CCITTError("vertical mode outside the row")
            if not color_white:
                black.append((start, min(a1, width)))
            cur_changes.append(a1)
            a0 = a1
            color_white = not color_white
        if len(cur_changes) > 2 * width + 4:
            raise CCITTError("more changes than pixels")
    # rebuild the reference changes from the decoded row (pass mode
    # contributes no changing elements, so cur_changes is incomplete)
    row = bytearray(width)
    for s, e in black:
        for x in range(max(s, 0), min(e, width)):
            row[x] = 1
    return black, _changes_of_row(bytes(row))


def _decode_1d_row(rd: _BitReader, width: int) -> list[tuple[int, int]]:
    """One T.4 1-D (Modified Huffman) row: alternating white/black
    runs from imaginary white. Returns black spans."""
    x = 0
    black: list[tuple[int, int]] = []
    color_white = True
    while x < width:
        run = _read_run(
            rd, _WHITE_DEC if color_white else _BLACK_DEC, width - x
        )
        if not color_white and run:
            black.append((x, x + run))
        x += run
        color_white = not color_white
    return black


def decode_g4(data: bytes, width: int, height: int) -> bytes:
    """ITU T.6 (Group 4 / MMR) block decode: every row codes against
    the previous one; the reference line above the first row is all
    white. Returns packed rows (1 = black). The optional trailing EOFB
    is ignored (TIFF knows the geometry)."""
    rd = _BitReader(data)
    stride = (width + 7) // 8
    out = bytearray(stride * height)
    ref_changes: list[int] = []  # imaginary all-white line
    for y in range(height):
        black, ref_changes = _decode_2d_row(rd, ref_changes, width)
        out[y * stride : (y + 1) * stride] = _runs_to_packed(
            [(s, e) for s, e in black if e > s], width
        )
    return bytes(out)


def _encode_2d_row(
    wr: _BitWriter, row: bytes, ref_changes: list[int], width: int
) -> None:
    """One 2-D coded row (shared by T.6 G4 and T.4 G3-2D): greedy
    standard mode selection — vertical when |a1-b1| <= 3, else pass
    when b2 < a1, else horizontal."""
    import bisect

    cur_changes = _changes_of_row(row)
    a0 = -1
    color_white = True
    while a0 < width:
        # a1: next change right of a0 (any color — it is by
        # construction the end of the current color's run)
        j = bisect.bisect_right(cur_changes, a0)
        a1 = cur_changes[j] if j < len(cur_changes) else width
        b1, b2 = _b1_b2(ref_changes, a0, color_white)
        if b1 < 0:
            b1 = width
        if b2 < 0:
            b2 = width
        if b2 < a1:
            v, n = _MODE_ENC["P"]
            wr.write(v, n)
            a0 = b2
            continue
        if abs(a1 - b1) <= 3:
            mode = {0: "V0", 1: "VR1", 2: "VR2", 3: "VR3",
                    -1: "VL1", -2: "VL2", -3: "VL3"}[a1 - b1]
            v, n = _MODE_ENC[mode]
            wr.write(v, n)
            a0 = a1
            color_white = not color_white
            continue
        # horizontal: two runs from max(a0, 0)
        a2 = cur_changes[j + 1] if j + 1 < len(cur_changes) else width
        start = max(a0, 0)
        v, n = _MODE_ENC["H"]
        wr.write(v, n)
        _write_run(
            wr, _WHITE_ENC if color_white else _BLACK_ENC, a1 - start
        )
        _write_run(
            wr, _BLACK_ENC if color_white else _WHITE_ENC, a2 - a1
        )
        a0 = a2


def encode_g4(rows: list[bytes], width: int) -> bytes:
    """Greedy standard T.6 encoder (see :func:`_encode_2d_row`)."""
    wr = _BitWriter()
    ref_changes: list[int] = []
    for row in rows:
        if len(row) != width:
            raise ValueError("row length disagrees with width")
        _encode_2d_row(wr, row, ref_changes, width)
        ref_changes = _changes_of_row(row)
    return wr.bytes()


def _read_eol(rd: _BitReader) -> None:
    """Consume fill bits + one EOL (>= 11 zeros then a 1). T.4 allows
    any number of 0 fill bits before the EOL, which merge into it."""
    zeros = 0
    while True:
        if rd.pos >= len(rd.data) * 8:
            raise CCITTError("EOL runs past end of stream")
        byte = rd.data[rd.pos >> 3]
        bit = (byte >> (7 - (rd.pos & 7))) & 1
        rd.pos += 1
        if bit == 0:
            zeros += 1
            continue
        if zeros < 11:
            raise CCITTError("EOL with fewer than 11 zero bits")
        return


def decode_g3(
    data: bytes,
    width: int,
    height: int,
    *,
    two_d: bool = False,
    aligned: bool = False,
) -> bytes:
    """ITU T.4 Group 3 decode (TIFF Compression 3): every row is
    preceded by an EOL; in 2-D mode (T4Options bit 0) the EOL carries
    a tag bit choosing 1-D (MH) or 2-D (MR, same modes as G4) coding
    for the next row; ``aligned`` (T4Options bit 2) pads each EOL to
    start on a byte boundary. A leading EOL is required per spec but
    tolerated absent (lenient, like real readers — some writers start
    straight into row data). Returns packed rows (1 = black)."""
    rd = _BitReader(data)
    stride = (width + 7) // 8
    out = bytearray(stride * height)
    ref_changes: list[int] = []
    for y in range(height):
        if aligned and y > 0:
            rd.align()
        # the EOL before each row (leading one optional on row 0)
        if y > 0 or _peek_is_eol(rd):
            _read_eol(rd)
        if two_d:
            if rd.pos >= len(rd.data) * 8:
                raise CCITTError("missing 2-D tag bit")
            byte = rd.data[rd.pos >> 3]
            tag = (byte >> (7 - (rd.pos & 7))) & 1
            rd.pos += 1
            if tag:  # 1 = one-dimensional row
                black = _decode_1d_row(rd, width)
                row = bytearray(width)
                for s, e in black:
                    for x in range(s, e):
                        row[x] = 1
                ref_changes = _changes_of_row(bytes(row))
            else:
                black, ref_changes = _decode_2d_row(rd, ref_changes, width)
        else:
            black = _decode_1d_row(rd, width)
        out[y * stride : (y + 1) * stride] = _runs_to_packed(
            [(s, e) for s, e in black if e > s], width
        )
    return bytes(out)


def _peek_is_eol(rd: _BitReader) -> bool:
    """True iff the stream continues with fill+EOL (>= 11 zeros then
    a 1) — used only to tolerate a missing LEADING EOL."""
    pos = rd.pos
    zeros = 0
    while pos < len(rd.data) * 8:
        bit = (rd.data[pos >> 3] >> (7 - (pos & 7))) & 1
        pos += 1
        if bit == 0:
            zeros += 1
            if zeros > 64:  # plenty for fill; avoid scanning the world
                return False
            continue
        return zeros >= 11
    return False


def encode_g3(
    rows: list[bytes],
    width: int,
    *,
    two_d: bool = False,
    aligned: bool = False,
    k: int = 2,
) -> bytes:
    """T.4 Group 3 encoder. 1-D mode: EOL + MH per row. 2-D mode:
    EOL+tag per row with at most ``k - 1`` consecutive 2-D rows after
    each 1-D row (the T.4 K-parameter error-containment rule)."""
    wr = _BitWriter()
    ref_changes: list[int] = []
    since_1d = 0
    for row in rows:
        if len(row) != width:
            raise ValueError("row length disagrees with width")
        if aligned:
            wr.align()
        wr.write(1, 12)  # EOL: 000000000001
        if not two_d:
            _encode_1d_row(wr, row, width)
            continue
        use_1d = since_1d >= k - 1
        wr.write(1 if use_1d else 0, 1)  # tag bit
        if use_1d:
            _encode_1d_row(wr, row, width)
            since_1d = 0
        else:
            _encode_2d_row(wr, row, ref_changes, width)
            since_1d += 1
        ref_changes = _changes_of_row(row)
    return wr.bytes()


def _encode_1d_row(wr: _BitWriter, row: bytes, width: int) -> None:
    x = 0
    color_white = True
    while x < width:
        run = 0
        want = 0 if color_white else 1
        while x + run < width and row[x + run] == want:
            run += 1
        _write_run(wr, _WHITE_ENC if color_white else _BLACK_ENC, run)
        x += run
        color_white = not color_white


def unpack_rows(packed: bytes, width: int, height: int) -> list[bytes]:
    """Packed MSB-first rows → 0/1-per-pixel rows (encoder input)."""
    stride = (width + 7) // 8
    rows = []
    for y in range(height):
        base = y * stride
        rows.append(bytes(
            (packed[base + (x >> 3)] >> (7 - (x & 7))) & 1
            for x in range(width)
        ))
    return rows
