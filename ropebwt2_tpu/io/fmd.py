"""FMD — fermi's static delta-coded FM-index format (rld0.c), the -d output.

Byte-identical re-implementation of the rld0 encoder from the format spec:

* data = superblocks of 2^23 64-bit words; small blocks of ssize=2^sbits
  words (sbits=3 for the CLI, rld_init(6,3), main.c:274)
* each small block: header with the previous blocks' marginal symbol counts
  since the last header, in adaptive 16/32/64-bit ints (type in the top 2
  bits of word 0, enc_next_block, rld0.c:107-135), then bit-packed runs
* a run (l, c) packs Elias-delta(l) followed by the 3-bit symbol, MSB-first
  within 64-bit words; a run never straddles a small-block boundary
  (rld_enc1, rld0.c:137-151)
* after the data: a sampled rank frame index (rld_rank_index,
  rld0.c:163-205)
* file: "RLD\\3" + (asize<<16|sbits) u32 + 8 reserved bytes + n_bytes u64 +
  n_frames u64 + 6 marginal counts u64 + data + frames (rld_dump,
  rld0.c:223-244).
"""

import struct

RLD_LBITS = 23
RLD_LSIZE = 1 << RLD_LBITS
IBITS_PLUS = 4


def _ilog2(v: int) -> int:
    return v.bit_length() - 1 if v > 0 else -1


def _delta_enc(x: int):
    """Elias-delta: gamma(y+1) then the low y bits of x, y = floor(log2 x).
    Returns (value, width) per rld_delta_enc1 (rld0.c:45-51)."""
    y = _ilog2(x)
    z = _ilog2(y + 1)
    width = (z << 1) + 1 + y
    val = (x ^ (1 << y)) | (y + 1) << y
    return val, width


class FmdEncoder:
    """Streaming rld0-compatible encoder (asize=6, abits=3)."""

    def __init__(self, asize=6, sbits=3):
        self.asize = asize
        self.asize1 = asize + 1
        self.abits = _ilog2(asize) + 1
        self.sbits = sbits
        self.ssize = 1 << sbits
        self.offset0 = [
            (self.asize1 * 16 + 63) // 64,
            (self.asize1 * 32 + 63) // 64,
            self.asize1,
        ]
        self.words = [0] * RLD_LSIZE  # current superblock
        self.supers = []  # completed superblocks (lists of words)
        self.cnt = [0] * self.asize1  # cumulative symbol counts
        self.mcnt = [0] * self.asize1  # snapshot at last block header
        # iterator state: block 0 has an implicit all-zero type-0 header
        self.shead = 0  # word index of current block within superblock
        self.p = self.offset0[0]  # current word index
        self.r = 64  # bits remaining in words[p]
        self._set_stail()
        # pending run (rld_enc merging)
        self.pc = -1
        self.pl = 0

    def _set_stail(self):
        end_of_super = self.shead + self.ssize == RLD_LSIZE
        self.stail = self.shead + self.ssize - (2 if end_of_super else 1)

    def _next_block(self):
        if self.stail + 2 == RLD_LSIZE:  # superblock full
            self.supers.append(self.words)
            self.words = [0] * RLD_LSIZE
            self.shead = 0
        else:
            self.shead += self.ssize
        marg = [self.cnt[i] - self.mcnt[i] for i in range(self.asize1)]
        if marg[0] < 0x4000:
            type_ = 0
            for i, v in enumerate(marg):  # 16-bit fields
                w, sh = divmod(i * 16, 64)
                self.words[self.shead + w] |= v << sh
        elif marg[0] < 0x40000000:
            type_ = 1
            for i, v in enumerate(marg):
                w, sh = divmod(i * 32, 64)
                self.words[self.shead + w] |= v << sh
        else:
            type_ = 2
            for i, v in enumerate(marg):
                self.words[self.shead + i] = v
        self.words[self.shead] |= type_ << 62
        self.p = self.shead + self.offset0[type_]
        self._set_stail()
        self.r = 64
        self.mcnt = list(self.cnt)

    def _enc1(self, l: int, c: int):
        val, w = _delta_enc(l)
        x = val << self.abits | c
        w += self.abits
        if w >= self.r and self.p == self.stail:
            self._next_block()
        if w > self.r:
            w -= self.r
            self.words[self.p] |= x >> w
            self.p += 1
            self.r = 64 - w
            self.words[self.p] = (x << self.r) & 0xFFFFFFFFFFFFFFFF
        else:
            self.r -= w
            self.words[self.p] |= (x << self.r) & 0xFFFFFFFFFFFFFFFF
        self.cnt[0] += l
        self.cnt[c + 1] += l

    def enc(self, l: int, c: int):
        if l == 0:
            return
        if self.pc != c:
            if self.pl:
                self._enc1(self.pl, self.pc)
            self.pl, self.pc = l, c
        else:
            self.pl += l

    def finish(self):
        if self.pl:
            self._enc1(self.pl, self.pc)
        self._next_block()
        n_words = len(self.supers) * RLD_LSIZE + self.p
        self.n_bytes = n_words * 8
        self.supers.append(self.words)
        self._build_frames()

    def _word(self, k: int) -> int:
        return self.supers[k >> RLD_LBITS][k & (RLD_LSIZE - 1)]

    def _build_frames(self):
        """rld_rank_index (rld0.c:163-205)."""
        asize, asize1 = self.asize, self.asize1
        n_blks = self.n_bytes * 8 // 64 // self.ssize + 1
        last = (self.n_bytes >> 3) >> self.sbits << self.sbits
        self.ibits = _ilog2(self.mcnt[0] // n_blks) + IBITS_PLUS
        self.n_frames = (
            (self.mcnt[0] + (1 << self.ibits) - 1) >> self.ibits
        ) + 1
        frame = [0] * (self.n_frames * asize1)
        cnt = [0] * asize
        k = 1
        i = self.ssize
        while i <= last:
            w0 = self._word(i)
            type_ = w0 >> 62
            if type_ == 0:
                for j in range(1, asize1):
                    ww, sh = divmod(j * 16, 64)
                    cnt[j - 1] += (self._word(i + ww) >> sh) & 0xFFFF
            elif type_ == 1:
                for j in range(1, asize1):
                    ww, sh = divmod(j * 32, 64)
                    v = (self._word(i + ww) >> sh) & 0xFFFFFFFF
                    cnt[j - 1] += v & 0x3FFFFFFF
            else:
                for j in range(1, asize1):
                    cnt[j - 1] += self._word(i + j)
            s = sum(cnt)
            while s >= k << self.ibits:
                k += 1
            if k < self.n_frames:
                x = k * asize1
                frame[x] = i
                for j in range(asize):
                    frame[x + j + 1] = cnt[j]
            i += self.ssize
        for k in range(1, self.n_frames):
            x = k * asize1
            if frame[x] == 0:
                for j in range(asize1):
                    frame[x + j] = frame[x - asize1 + j]
        self.frame = frame

    def dump(self, out):
        out.write(b"RLD\x03")
        out.write(struct.pack("<I", self.asize << 16 | self.sbits))
        out.write(struct.pack("<Q", 0))
        out.write(struct.pack("<Q", self.n_bytes))
        out.write(struct.pack("<Q", self.n_frames))
        for v in self.mcnt[1:]:
            out.write(struct.pack("<Q", v))
        n_words = self.n_bytes // 8
        for sup in self.supers:
            take = min(n_words, RLD_LSIZE)
            out.write(
                b"".join(struct.pack("<Q", w) for w in sup[:take])
            )
            n_words -= take
            if n_words == 0:
                break
        out.write(b"".join(struct.pack("<Q", v) for v in self.frame))


def read_fmd(path_or_file):
    """Decode an FMD file back to (runs, mcnt) — rld_restore + rld_dec
    equivalents (rld0.c:269-306, rld0.h:79-116).  Also accepts the raw
    5+3 RLE byte-stream fallback the reference supports."""
    f = (
        open(path_or_file, "rb")
        if isinstance(path_or_file, (str, bytes))
        else path_or_file
    )
    close = isinstance(path_or_file, (str, bytes))
    try:
        head = f.read(4)
        if head != b"RLD\x03":
            # raw 5+3 RLE byte stream: byte = len<<3 | sym.  Like the
            # reference (rld_restore_header has already consumed the 4
            # magic bytes before the fallback loop, rld0.c:276-289), the
            # first 4 bytes are dropped.
            runs = []
            data = f.read()
            for byte in data:
                if byte >> 3:
                    c, l = byte & 7, byte >> 3
                    if runs and runs[-1][0] == c:
                        runs[-1][1] += l
                    else:
                        runs.append([c, l])
            mcnt = [0] * 7
            for c, l in runs:
                mcnt[0] += l
                mcnt[c + 1] += l
            return [(c, l) for c, l in runs], mcnt

        (a,) = struct.unpack("<I", f.read(4))
        asize, sbits = a >> 16, a & 0xFFFF
        asize1 = asize + 1
        abits = _ilog2(asize) + 1
        ssize = 1 << sbits
        struct.unpack("<Q", f.read(8))  # reserved
        (n_bytes,) = struct.unpack("<Q", f.read(8))
        (n_frames,) = struct.unpack("<Q", f.read(8))
        mcnt_tail = struct.unpack(f"<{asize}Q", f.read(8 * asize))
        n_words = n_bytes // 8
        words = struct.unpack(f"<{n_words}Q", f.read(8 * n_words))
        # frames follow; not needed for decoding

        offset0 = [
            (asize1 * 16 + 63) // 64,
            (asize1 * 32 + 63) // 64,
            asize1,
        ]
        last = (n_bytes >> 3) >> sbits << sbits
        runs = []
        shead = 0
        while shead != last:
            type_ = words[shead] >> 62
            p = shead + offset0[type_]
            stail = shead + ssize - 1  # superblocks never split here: files
            # smaller than RLD_LSIZE words; guarded below
            if (shead + ssize) % RLD_LSIZE == 0:
                stail -= 1
            r = 64
            while True:
                x = (words[p] << (64 - r)) & 0xFFFFFFFFFFFFFFFF
                if p != stail and r != 64:
                    x |= words[p + 1] >> r
                if x >> 63 == 0:
                    w = (0x333333335555779B >> ((x >> 59) << 2)) & 0xF
                    if w == 0xB and (x >> 58) == 0:
                        break  # end of block padding
                    l_ = (x >> (64 - w)) - 1
                    y = ((x << w) & 0xFFFFFFFFFFFFFFFF) >> (64 - l_) | (
                        1 << l_
                    )
                    w += l_
                else:
                    w = y = 1
                c = ((x << w) & 0xFFFFFFFFFFFFFFFF) >> (64 - abits)
                w += abits
                if c > asize:
                    break
                if r > w:
                    r -= w
                else:
                    p += 1
                    r = 64 + r - w
                if p > stail:
                    break
                if runs and runs[-1][0] == c:
                    runs[-1][1] += y
                else:
                    runs.append([c, int(y)])
            shead += ssize
        mcnt = [sum(mcnt_tail)] + list(mcnt_tail)
        return [(c, l) for c, l in runs], mcnt
    finally:
        if close:
            f.close()


def write_fmd(runs, out, log_summary=True):
    enc = FmdEncoder(6, 3)
    for c, l in runs:
        enc.enc(l, c)
    enc.finish()
    if log_summary:
        from ..utils import log

        log.message(
            "main",
            "rld: (tot, $, A, C, G, T, N) = (%d, %d, %d, %d, %d, %d, %d)",
            enc.cnt[0],
            *[enc.mcnt[i] for i in range(1, 7)],
        )
    enc.dump(out)
