"""Python-computed oracles for the xxhash64-based rows-only queries.

The driver's oracle protocol runs portable SQL in DuckDB, which cannot
restate Spark's xxhash64 — so the MinHash/LSH family has always been
"rows-only" in CORRECTNESS. Engine-portable SQL is not required of the
ORACLE itself, though: this module reimplements XXH64 (the exact
Catalyst kernel semantics: seed 42, hashLong/hashInt specializations,
SIGNED 64-bit min) independently in Python/numpy and recomputes the
full candidate pipeline — tokenize -> shingle -> 128-hash signature ->
32x4 banding -> bucket collision pairs -> signature-agreement
estimate — from the same parquet inputs. check_oracle.py treats these
exactly like SQL oracles (schema/type/value-exact compare), flipping
the covered queries from rows-only to hash-gated in the committed
local artifact. Dev/judge tool only; the driver's own gate still
records no_oracle for these.

Covered: minhash_pairs, minhash_indexed.
"""
import re

import numpy as np
import pandas as pd

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h):
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(b: bytes, seed: int = 42) -> int:
    """XXH64 over a byte string — Catalyst XXH64.hashUTF8String."""
    n = len(b)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for off in range(4):
                k = int.from_bytes(b[i + off * 8:i + off * 8 + 8], "little")
                if off == 0:
                    v1 = (_rotl((v1 + k * _P2) & _M, 31) * _P1) & _M
                elif off == 1:
                    v2 = (_rotl((v2 + k * _P2) & _M, 31) * _P1) & _M
                elif off == 2:
                    v3 = (_rotl((v3 + k * _P2) & _M, 31) * _P1) & _M
                else:
                    v4 = (_rotl((v4 + k * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(b[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(b[i:i + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (b[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_long(v: int, seed: int) -> int:
    """Catalyst XXH64.hashLong — XXH64 of one 8-byte word."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def xxh64_int(v: int, seed: int) -> int:
    """Catalyst XXH64.hashInt — XXH64 of one 4-byte word."""
    h = (seed + _P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


# ---- vectorized hashLong (the 128-lane signature inner loop) --------
_NP1 = np.uint64(_P1)
_NP2 = np.uint64(_P2)
_NP3 = np.uint64(_P3)
_NP4 = np.uint64(_P4)
_NP5 = np.uint64(_P5)


def _nrotl(x, r):
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _nfmix(h):
    h = h ^ (h >> np.uint64(33))
    h = h * _NP2
    h = h ^ (h >> np.uint64(29))
    h = h * _NP3
    h = h ^ (h >> np.uint64(32))
    return h


def _nhash_long(v, seed):
    """Vectorized xxh64_long over broadcastable uint64 arrays."""
    h = seed + _NP5 + np.uint64(8)
    h = h ^ (_nrotl(v * _NP2, 31) * _NP1)
    h = _nrotl(h, 27) * _NP1 + _NP4
    return _nfmix(h)


# ---- the shared text pipeline (mirrors TextFns.tokens + MinHashSig) -
_NONWORD = re.compile(r"[^a-z0-9 ]")
_SPACES = re.compile(r" +")


def tokens(text):
    if text is None:
        return None
    t = _SPACES.sub(" ", _NONWORD.sub(" ", text.lower())).strip()
    return [x for x in t.split(" ") if x] if t else []


# hashInt(i, 42) prefixes — the MinHashSig per-lane seeds
_SEEDS128 = np.array([xxh64_int(i, 42) for i in range(128)], dtype=np.uint64)


def minhash_sig(toks, shingle_len=3, num_hashes=128):
    """Signed-min 128-lane signature of a token list (MinHashSig)."""
    if toks is None:
        return None
    if len(toks) < shingle_len:
        shingles = [" ".join(toks)]
    else:
        shingles = [" ".join(toks[i:i + shingle_len])
                    for i in range(len(toks) - shingle_len + 1)]
    hs = np.array(sorted({xxh64_bytes(s.encode("utf-8")) for s in shingles}),
                  dtype=np.uint64)
    mat = _nhash_long(hs[:, None], _SEEDS128[None, :num_hashes])
    # Spark's MIN is over SIGNED longs (sigs start at Long.MaxValue)
    return mat.view(np.int64).min(axis=0)


def _bucket(sig_slice):
    """Spark xxhash64(array<long>) — fold hashLong, seed 42."""
    h = 42
    for v in sig_slice:
        h = xxh64_long(int(v) & _M, h)
    return h


def _banded(sigs_by_doc, bands=32, rows_per_band=4):
    """{(band, bucket): [doc_id…]} over all docs' signatures."""
    groups = {}
    for doc_id, sig in sigs_by_doc.items():
        for b in range(bands):
            key = (b, _bucket(sig[b * rows_per_band:(b + 1) * rows_per_band]))
            groups.setdefault(key, []).append(doc_id)
    return groups


def _doc_sigs(con, sf_dir):
    docs = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id").fetchdf()
    sigs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = tokens(text)
        if toks is None:
            continue  # null sig is filtered before banding
        sigs[int(doc_id)] = minhash_sig(toks)
    return sigs


def _est(sig_a, sig_b):
    return float(np.count_nonzero(sig_a == sig_b)) / len(sig_a)


def minhash_pairs(con, sf_dir):
    """Oracle for `minhash_pairs`: all-pairs LSH collisions, 32x4
    banding, est_jaccard >= 0.25."""
    sigs = _doc_sigs(con, sf_dir)
    pairs = set()
    for ids in _banded(sigs).values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    rows = [(a, b, _est(sigs[a], sigs[b])) for a, b in sorted(pairs)]
    df = pd.DataFrame(rows, columns=["id_a", "id_b", "est_jaccard"])
    df = df[df["est_jaccard"] >= 0.25].reset_index(drop=True)
    return df.astype({"id_a": "int64", "id_b": "int64",
                      "est_jaccard": "float64"})


def minhash_indexed(con, sf_dir):
    """Oracle for `minhash_indexed`: doc_id % 10 == 0 probes against
    an index of the other 90% — collision pairs across the split."""
    sigs = _doc_sigs(con, sf_dir)
    probe = {d for d in sigs if d % 10 == 0}
    pairs = set()
    for ids in _banded(sigs).values():
        ps = [d for d in ids if d in probe]
        xs = [d for d in ids if d not in probe]
        for p in ps:
            for x in xs:
                pairs.add((p, x))
    rows = [(p, x, _est(sigs[p], sigs[x])) for p, x in sorted(pairs)]
    df = pd.DataFrame(rows, columns=["probe_id", "index_id", "est_jaccard"])
    df = df[df["est_jaccard"] >= 0.25].reset_index(drop=True)
    return df.astype({"probe_id": "int64", "index_id": "int64",
                      "est_jaccard": "float64"})


# ---- SimHash + capped pigeonhole (simhash_pairs) --------------------

_BITS64 = np.arange(64, dtype=np.uint64)


def simhash64(toks):
    """graft_simhash64: per-occurrence xxh64 bit votes, majority
    (bit unpack + vote vectorized — the x10/x30 sweeps run this over
    10M+ token occurrences)."""
    if not toks:
        return None
    hs = np.array([xxh64_bytes(t.encode("utf-8")) for t in toks],
                  dtype=np.uint64)
    ones = ((hs[:, None] >> _BITS64[None, :]) & np.uint64(1)).sum(axis=0)
    sh = int(((2 * ones > len(toks)).astype(np.uint64)
              << _BITS64).sum(dtype=np.uint64))
    return sh - (1 << 64) if sh >= (1 << 63) else sh  # signed long


def simhash_pairs(con, sf_dir):
    """Oracle for `simhash_pairs`: Hamming-<=6 pairs via the pigeonhole
    chunk split with the maxPieceFreq=200 cap and the hot-bucket
    sub-banding recursion (Dedup.hammingPairsOfSignatures)."""
    from collections import defaultdict
    docs = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id").fetchdf()
    shs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = tokens(text)
        if toks is None:
            continue
        sh = simhash64(toks)
        if sh is None:
            continue  # empty-token docs drop before pairing
        shs[int(doc_id)] = sh
    max_dist, cap = 6, 200
    n_chunks = max_dist + 1          # 7
    bits = 64 // n_chunks            # 9
    sub_bits = (64 - bits + n_chunks - 1) // n_chunks  # 8

    pairs = {}

    def hamming(a, b):
        return bin((shs[a] ^ shs[b]) & _M).count("1")

    def add_pairs(ids):
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                h = hamming(a, b)
                if h <= max_dist:
                    pairs[(a, b)] = h

    groups = defaultdict(list)
    for d, sh in shs.items():
        for c in range(n_chunks):
            groups[(c, (sh >> (c * bits)) & ((1 << bits) - 1))].append(d)
    for (c, _p), ids in groups.items():
        if len(ids) <= cap:
            add_pairs(ids)
        else:
            # hot bucket: re-pigeonhole the complement bits; sub-groups
            # still over the cap are finally dropped
            sub = defaultdict(list)
            for d in ids:
                shu = shs[d] & _M
                low_mask = (1 << (c * bits)) - 1
                rest = (((shu >> ((c + 1) * bits)) << (c * bits))
                        | (shs[d] & low_mask)) & _M
                for sc in range(n_chunks):
                    sub[(sc, (rest >> (sc * sub_bits))
                         & ((1 << sub_bits) - 1))].append(d)
            for sids in sub.values():
                if len(sids) <= cap:
                    add_pairs(sids)
    rows = sorted((a, b, h) for (a, b), h in pairs.items())
    df = pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])
    return df.astype({"id_a": "int64", "id_b": "int64", "hamming": "int32"})


# ---- sign-LSH approximate KNN (knn_lsh) -----------------------------

def _signed(h):
    return h - (1 << 64) if h >= (1 << 63) else h


# SignSketch.planeSeeds(p) = hashInt(p, 42); component(p, d) =
# signed(hashInt(d, seed_p)) / Long.MaxValue
_SIGN_SEEDS = [xxh64_int(p, 42) for p in range(30)]


def _plane_matrix(bits, dim):
    m = np.empty((bits, dim), dtype=np.float64)
    for p in range(bits):
        for d in range(dim):
            m[p, d] = _signed(xxh64_int(d, _SIGN_SEEDS[p])) / float((1 << 63) - 1)
    return m


def sign_sketch(vec, planes):
    """graft_signsketch: acc(p) += x_d * comp(p, d) in d order."""
    acc = np.zeros(planes.shape[0], dtype=np.float64)
    for d in range(len(vec)):
        acc += np.float64(vec[d]) * planes[:, d]
    sk = 0
    for p in range(planes.shape[0]):
        if acc[p] > 0.0:
            sk |= 1 << p
    return sk


def _dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _round_half_up(x, scale=6):
    from decimal import Decimal, ROUND_HALF_UP
    return float(Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP))


def _cos6(qv, cv, qn, cn):
    d = qn * cn
    return _round_half_up(0.0 if d == 0.0 else _dot(qv, cv) / d)


def knn_lsh(con, sf_dir):
    """Oracle for `knn_lsh`: 3 tables x 8-bit sign sketches, multi-probe
    Hamming <= 3, cosine-scored candidates, top-5 per query."""
    emb = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchdf()
    ids = [int(v) for v in emb["vec_id"]]
    vecs = {i: np.asarray(v, dtype=np.float32)
            for i, v in zip(ids, emb["embedding"])}
    bits, tables, probe_dist, k = 8, 3, 3, 5
    dim = len(next(iter(vecs.values())))
    planes = _plane_matrix(bits * tables, dim)
    sk = {i: sign_sketch(v, planes) for i, v in vecs.items()}
    norms = {i: np.sqrt(_dot(v, v)) for i, v in vecs.items()}
    mask = (1 << bits) - 1

    def near(a, b):
        for t in range(tables):
            if bin(((a >> (t * bits)) & mask)
                   ^ ((b >> (t * bits)) & mask)).count("1") <= probe_dist:
                return True
        return False

    rows = []
    for q in [i for i in ids if i < 10]:
        cands = [c for c in ids if c != q and near(sk[q], sk[c])]
        scored = sorted(
            ((_cos6(vecs[q], vecs[c], norms[q], norms[c]), c) for c in cands),
            key=lambda t: (-t[0], t[1]))
        for rank, (cos, c) in enumerate(scored[:k], start=1):
            rows.append((q, c, cos, rank))
    df = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos", "rank"])
    return df.astype({"query_id": "int64", "neighbor_id": "int64",
                      "cos": "float64", "rank": "int64"})


# ---- learned BPE (bpe_tokens) ---------------------------------------
# Java \s is ASCII-only; Python's is Unicode — spell the class out so
# the pre-tokenizer matches Bpe.PreTokenRegex exactly.
_JWS = " \\t\\n\\x0b\\f\\r"
_PRETOKEN = re.compile(f"[A-Za-z]+|[0-9]|[^A-Za-z0-9{_JWS}]")
_EOW = "</w>"


def _train_merges(word_counts, num_merges=256):
    """Bpe.trainMerges: Sennrich merges, ties (-count, a, b), stop
    when no pair occurs twice."""
    words = [list(w) + [_EOW] for w, _ in word_counts]
    counts = [c for _, c in word_counts]
    pair_counts = {}
    pair_words = {}

    def tally(i, sign):
        sym = words[i]
        for j in range(len(sym) - 1):
            p = (sym[j], sym[j + 1])
            c = pair_counts.get(p, 0) + sign * counts[i]
            if c <= 0:
                pair_counts.pop(p, None)
                pair_words.get(p, set()).discard(i)
            else:
                pair_counts[p] = c
                if sign > 0:
                    pair_words.setdefault(p, set()).add(i)
                else:
                    pair_words.get(p, set()).discard(i)

    for i in range(len(words)):
        tally(i, 1)
    merges = []
    step = 0
    while step < num_merges and pair_counts:
        best, best_count = min(pair_counts.items(),
                               key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best_count < 2:
            break
        merges.append(best)
        a, b = best
        for i in sorted(pair_words.get(best, set())):
            tally(i, -1)
            sym, out, j = words[i], [], 0
            while j < len(sym):
                if j < len(sym) - 1 and sym[j] == a and sym[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = out
            tally(i, 1)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
        step += 1
    return merges


def _encode_word(w, ranks):
    """BpeEncoder.encodeWord: lowest rank first, all occurrences."""
    sym = list(w) + [_EOW]
    while len(sym) > 1:
        best_rank, best_at = None, -1
        for j in range(len(sym) - 1):
            r = ranks.get((sym[j], sym[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_at = r, j
        if best_at < 0:
            break
        a, b = sym[best_at], sym[best_at + 1]
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_tokens(con, sf_dir):
    """Oracle for `bpe_tokens`: learned-BPE token counts under the
    corpus-trained 256-merge table (Bpe.train + BpeEncoder)."""
    docs = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id").fetchdf()
    wc = {}
    for text in docs["text"]:
        if text is None:
            continue
        for w in _PRETOKEN.findall(text):
            wc[w] = wc.get(w, 0) + 1
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:65536]
    ranks = {p: i for i, p in enumerate(_train_merges(top))}
    memo = {}

    def count_word(w):
        if w not in memo:
            memo[w] = len(_encode_word(w, ranks))
        return memo[w]

    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        pre = _PRETOKEN.findall(text) if text is not None else []
        rows.append((int(doc_id), sum(count_word(w) for w in pre),
                     len(pre), len(text) if text is not None else None))
    df = pd.DataFrame(rows, columns=["doc_id", "n_bpe_learned",
                                     "n_pretokens", "n_chars"])
    return df.astype({"doc_id": "int64", "n_bpe_learned": "int64",
                      "n_pretokens": "int64", "n_chars": "int64"})


REGISTRY = {
    "minhash_pairs": minhash_pairs,
    "minhash_indexed": minhash_indexed,
    "simhash_pairs": simhash_pairs,
    "knn_lsh": knn_lsh,
    "bpe_tokens": bpe_tokens,
}
