#!/usr/bin/env python3
"""Engine-independent golden recomputation for four naive-oracle queries.

The 15 `rowsOnly` queries are hash-checked against NaiveOracles — an
independent Spark re-derivation, but SAME JVM, same float semantics: a
bug shared by both Spark paths would be invisible. This script
recomputes four of them in pure Python (parquet in via duckdb — the
driver-side oracle engine — everything else from first principles:
XXH64 from its public spec, java.util.Random's LCG for the remix
constants, classic mutable BPE), so the pinned constants in
GoldenConstantSpec are reproducible OUTSIDE the JVM entirely:

  x88_bpe_learn            — the 8 merge rows
  x93_bpe_encode           — corpus fingerprint (count + 4 integer sums)
  x57_incremental_neardup  — full duplicate pair set (id, dup_of,
                             est_jac*16 as int, jac as exact fraction)
  x158_stored_minhash_probe— same pair set over the maintained corpus
                             (base − %100==50 deletions + %100==0
                             extension ≡ docs − %100==50)

Usage: python3 tools/golden_check.py /root/testdata/sf0.001
Prints one JSON object; paste the values into GoldenConstantSpec (the
spec's header documents this provenance).
"""
import sys, json, math
import duckdb

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def fmix(h):
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Reference XXH64 over a byte string (little-endian words) — the
    algorithm Spark's catalyst XXH64 implements."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i + 32 <= n:
            def rnd(v, off):
                k = int.from_bytes(data[off:off + 8], "little")
                return (rotl((v + k * P2) & M64, 31) * P1) & M64
            v1 = rnd(v1, i); v2 = rnd(v2, i + 8)
            v3 = rnd(v3, i + 16); v4 = rnd(v4, i + 24)
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (rotl((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (rotl((k * P2) & M64, 31) * P1) & M64
        h = (rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * P1) & M64
        h = (rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (rotl(h, 11) * P1) & M64
        i += 1
    return fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: one 8-byte block."""
    h = (seed + P5 + 8) & M64
    h ^= (rotl((value * P2) & M64, 31) * P1) & M64
    h = (rotl(h, 27) * P1 + P4) & M64
    return fmix(h)


def signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def unsigned(s):
    return s & M64


class JavaRandom:
    """java.util.Random's LCG — scala.util.Random delegates to it."""
    def __init__(self, seed):
        self.s = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def next(self, bits):
        self.s = (self.s * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        v = self.s >> (48 - bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def next_long(self):
        hi = self.next(32)
        lo = self.next(32)
        v = (hi << 32) + lo
        v &= M64
        return signed(v)


# MinhashSigs.mixConsts: Array.fill(64)(new scala.util.Random(20240812L).nextLong())
_r = JavaRandom(20240812)
MIX_CONSTS = [_r.next_long() for _ in range(64)]


def mix(h_signed: int, i: int) -> int:
    if i == 0:
        return h_signed
    r = (i * 7) % 61 + 1
    h = unsigned(h_signed)
    v = (h ^ rotl(h, r)) ^ unsigned(MIX_CONSTS[i])
    return signed(v & M64)


def hashed_shingles(text: str, n: int):
    """HashedNgrams.compute semantics: split on single spaces, distinct
    first-occurrence word n-grams, each gram = exact byte substring,
    xxh64 seed 42; <n tokens -> whole text as one gram."""
    toks = text.split(" ")
    out, seen = [], set()
    if len(toks) >= n:
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n]).encode("utf-8")
            h = signed(xxh64(g, 42))
            if h not in seen:
                seen.add(h)
                out.append(h)
    else:
        out.append(signed(xxh64(text.encode("utf-8"), 42)))
    return out


def minhash_row(doc_id, text, k=16):
    toks = sorted(hashed_shingles(text, 2))  # signed sort = sort_array
    sig = [min(mix(h, i) for h in toks) for i in range(k)]
    return doc_id, len(toks), toks, sig


def band_keys(sig, k=16, bands=8):
    rpb = k // bands
    keys = []
    for bd in range(bands):
        h = 42
        for i in range(bd * rpb, (bd + 1) * rpb):
            h = xxh64_long(unsigned(sig[i]), h)
        keys.append((bd, signed(h)))
    return keys


def near_dup_pairs(batch_rows, index_rows, k=16, threshold=0.8):
    """nearDupAgainstIndex semantics (batch vs index; identical banding,
    size-ratio, est-floor, exact-Jaccard cascade)."""
    est_floor = max(0.0, threshold - 2 * math.sqrt(threshold * (1 - threshold) / k))
    # band buckets for the index
    buckets = {}
    for (nid, sz, toks, sig) in index_rows:
        for bk in band_keys(sig, k):
            buckets.setdefault(bk, []).append((nid, sz, sig))
    out = {}
    for (bid, bsz, btoks, bsig) in batch_rows:
        bset = set(btoks)
        cands = set()
        for bk in band_keys(bsig, k):
            for (nid, sz, sig) in buckets.get(bk, ()):
                cands.add((nid, sz, tuple(sig)))
        for (nid, sz, sig) in cands:
            if min(bsz, sz) < max(bsz, sz) * threshold - 1e-6:
                continue
            eq = sum(1 for i in range(k) if bsig[i] == sig[i])
            est = eq / k
            if est < est_floor:
                continue
            # exact jaccard on distinct shingle-hash sets
            idx_toks = toks_by_id[nid]
            inter = len(bset & idx_toks)
            jac = inter / (bsz + sz - inter)
            if jac >= threshold:
                out[(bid, nid)] = (eq, inter, bsz + sz - inter)
    return out


def classic_bpe(word_freqs, iters=8):
    vocab = [(list(w), f) for (w, f) in word_freqs]
    merges = []
    for it in range(1, iters + 1):
        counts = {}
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((it, l, r, c))
        nv = []
        for syms, f in vocab:
            b, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    b.append(l + r); i += 2
                else:
                    b.append(syms[i]); i += 1
            nv.append((b, f))
        vocab = nv
    return merges


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') "
        "ORDER BY doc_id").fetchall()

    # ---- x88 / x93: classic BPE ----
    wf = {}
    for _, text in docs:
        for w in text.split(" "):
            if len(w) >= 1:
                wf[w] = wf.get(w, 0) + 1
    merges = classic_bpe(sorted(wf.items()))
    x88 = [[it, l, r, c] for (it, l, r, c) in merges]

    pair_list = [(l, r) for (_, l, r, _) in merges]
    n_docs = len(docs)
    s_words = s_chars = s_bpe = s_weighted = 0
    for doc_id, text in docs:
        ws = text.split(" ")
        nb = 0
        for w in ws:
            syms = list(w)
            for (l, r) in pair_list:
                b, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        b.append(l + r); i += 2
                    else:
                        b.append(syms[i]); i += 1
                syms = b
            nb += len(syms)
        s_words += len(ws)
        s_chars += len(text)
        s_bpe += nb
        s_weighted += doc_id * nb
    x93 = {"n_docs": n_docs, "sum_words": s_words, "sum_chars": s_chars,
           "sum_bpe": s_bpe, "sum_id_weighted_bpe": s_weighted}

    # ---- x57: batch (%50==0, id+2e6) vs full-corpus index ----
    global toks_by_id
    rows = [minhash_row(i, t) for (i, t) in docs]
    toks_by_id = {r[0]: set(r[2]) for r in rows}
    batch = [(i + 2000000, sz, t, s) for (i, sz, t, s) in rows if i % 50 == 0]
    x57_pairs = near_dup_pairs(batch, rows)
    x57 = sorted([[a, b, eq, inter, un]
                  for ((a, b), (eq, inter, un)) in x57_pairs.items()])

    # ---- x158: same probe vs the maintained corpus
    #      (base %100!=0 + extend %100==0 − delete %100==50 ≡ %100!=50) --
    surv = [r for r in rows if r[0] % 100 != 50]
    x158_pairs = near_dup_pairs(batch, surv)
    x158 = sorted([[a, b, eq, inter, un]
                   for ((a, b), (eq, inter, un)) in x158_pairs.items()])

    print(json.dumps({"sf": sf, "x88": x88, "x93": x93,
                      "x57": x57, "x158": x158}))


if __name__ == "__main__":
    main()
