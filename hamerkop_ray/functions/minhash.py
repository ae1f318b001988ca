"""Vectorized MinHash / LSH-band and SimHash kernels.

Standard constructions from the literature (Broder 1997 min-wise hashing;
Indyk/Gionis et al. LSH; Charikar 2002 SimHash), implemented with numpy so a
batch of strings is hashed without Python-level inner loops where possible.

Used for (a) fuzzy blocking keys over name strings (character 3-gram shingles
per BASELINE.json north_star) and (b) near-duplicate document detection
(functions as in large-scale training-data dedup).

All hashing is blake2b-seeded and deterministic across processes.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .strings import shingles

_MERSENNE = (1 << 61) - 1


def _hash_strings(items: list[str]) -> np.ndarray:
    """Vectorized deterministic u64 hash of a list of strings (pandas
    siphash with its fixed default key — C speed, no per-string python
    hashlib round trips, stable across processes)."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(items, dtype=object)).astype(np.uint64)


def _coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficients for the universal hash family."""
    out_a = np.empty(num_perm, dtype=np.uint64)
    out_b = np.empty(num_perm, dtype=np.uint64)
    for i in range(num_perm):
        d = hashlib.blake2b(f"minhash:{seed}:{i}".encode(), digest_size=16).digest()
        out_a[i] = (int.from_bytes(d[:8], "little") % (_MERSENNE - 1)) + 1
        out_b[i] = int.from_bytes(d[8:], "little") % _MERSENNE
    return out_a, out_b


class MinHasher:
    """MinHash signatures over character n-gram shingles.

    Build once (per actor / per process) — coefficient setup is the stateful
    part; ``signature`` is then vectorized over a token's shingle set.
    """

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, seed: int = 1):
        self.num_perm = num_perm
        self.shingle_n = shingle_n
        self.a, self.b = _coeffs(num_perm, seed)

    def _shingle_hashes(self, s: str) -> np.ndarray:
        sh = shingles(s, self.shingle_n)
        if not sh:
            return np.zeros(1, dtype=np.uint64)
        return _hash_strings(sh)

    def signature(self, s: str) -> np.ndarray:
        """num_perm minima of (a*h + b) mod p over the shingle hashes."""
        h = self._shingle_hashes(s) % _MERSENNE  # (n,)
        # (num_perm, n) without python loops
        vals = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) signature matrix, bit-identical to stacking
        ``signature`` per doc but computed in ONE vectorized pass: all docs'
        shingle hashes are concatenated, the hash family is applied to the
        flat array (chunked to bound the (num_perm × n_shingles) temporary),
        and per-doc minima come from np.minimum.reduceat at the doc offsets
        (VERDICT r2 #7: the per-doc python loop was the residual hot spot
        for long-document corpora)."""
        n_docs = len(texts)
        if n_docs == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        sh_lists = [shingles(s, self.shingle_n) for s in texts]
        lens = np.array([max(1, len(sh)) for sh in sh_lists], dtype=np.int64)
        flat: list[str] = []
        for sh in sh_lists:
            flat.extend(sh)
        flat_h = np.zeros(int(lens.sum()), dtype=np.uint64)
        if flat:
            nonempty = _hash_strings(flat) % _MERSENNE
            # docs with no shingles occupy one zero-hash slot (the same
            # zeros(1) placeholder the per-doc path uses)
            pos = 0
            src = 0
            for sh, ln in zip(sh_lists, lens):
                if sh:
                    flat_h[pos : pos + ln] = nonempty[src : src + ln]
                    src += int(ln)
                pos += int(ln)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        out = np.empty((n_docs, self.num_perm), dtype=np.uint64)
        # chunk docs so the (num_perm × chunk_shingles) temporary stays small
        max_shingles = 1 << 17
        d0 = 0
        while d0 < n_docs:
            d1 = d0 + 1
            tot = int(lens[d0])
            while d1 < n_docs and tot + int(lens[d1]) <= max_shingles:
                tot += int(lens[d1])
                d1 += 1
            lo, hi = int(starts[d0]), int(starts[d0] + tot)
            h = flat_h[lo:hi]
            vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
            rel = (starts[d0:d1] - lo).astype(np.int64)
            out[d0:d1] = np.minimum.reduceat(vals, rel, axis=1).T
            d0 = d1
        return out

    def band_keys_matrix(self, sig_mat: np.ndarray, bands: int = 16) -> list[list[str]]:
        """band_keys_from_sig for a whole (n_docs, num_perm) matrix —
        identical strings, mixing vectorized across docs."""
        rows = self.num_perm // bands
        n = sig_mat.shape[0]
        mat = sig_mat[:, : bands * rows].reshape(n, bands, rows)
        with np.errstate(over="ignore"):
            mixed = np.zeros((n, bands), dtype=np.uint64)
            for j in range(rows):
                mixed = mixed * np.uint64(0x9E3779B97F4A7C15) + mat[:, :, j]
        return [
            [f"{b}:{int(v):016x}" for b, v in enumerate(row)]
            for row in mixed
        ]

    def band_keys(self, s: str, bands: int = 16) -> list[str]:
        """LSH band keys: signature split into ``bands`` rows-per-band groups,
        each band mixed to one u64 key (vectorized odd-constant polynomial
        mix — equal bands ⇒ equal keys, which is all LSH needs) prefixed by
        the band index."""
        return self.band_keys_from_sig(self.signature(s), bands)

    def band_keys_from_sig(self, sig: np.ndarray, bands: int = 16) -> list[str]:
        """Band keys from a precomputed signature (so one signature serves
        both the band shuffle key and the in-bucket verification payload
        without being recomputed)."""
        rows = self.num_perm // bands
        mat = sig[: bands * rows].reshape(bands, rows)
        with np.errstate(over="ignore"):
            mixed = np.zeros(bands, dtype=np.uint64)
            for j in range(rows):
                mixed = mixed * np.uint64(0x9E3779B97F4A7C15) + mat[:, j]
        return [f"{b}:{int(v):016x}" for b, v in enumerate(mixed)]

    def jaccard_estimate(self, sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))


def derive_bands(threshold: float, num_perm: int = 64) -> int:
    """Number of LSH bands derived from the verification threshold.

    Picks the most selective banding (largest rows-per-band r, a divisor of
    num_perm) whose S-curve midpoint s* = (1/b)^(1/r) does not exceed the
    threshold — so candidate recall at the threshold is retained while
    bucket collisions for sub-threshold pairs drop off as steeply as the
    signature allows.  Fixed (bands, rows) decoupled from the threshold is
    how round 2 ended up with b=16,r=4 (s*≈0.5) feeding an 0.8-threshold
    verifier — ~10³ more candidates than needed (VERDICT r2 #2).
    """
    for r in range(num_perm, 0, -1):
        if num_perm % r:
            continue
        b = num_perm // r
        if b < 2:
            continue  # a single band only recalls identical signatures
        if (1.0 / b) ** (1.0 / r) <= threshold:
            return b
    return num_perm  # threshold below every curve: most permissive (r=1)


def exact_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact character n-gram Jaccard (verification step after LSH)."""
    sa, sb = set(shingles(a, n)), set(shingles(b, n))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def simhash(s: str, n: int = 3, bits: int = 64) -> int:
    """Charikar SimHash over character n-gram shingles (fully vectorized:
    one hash kernel + one bit-matrix reduction per string)."""
    sh = shingles(s, n)
    if not sh:
        return 0
    hs = _hash_strings(sh)  # (n_shingles,) u64
    bitmat = (hs[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & 1
    acc = np.where(bitmat.astype(bool), 1, -1).sum(axis=0)
    out = 0
    for i in np.nonzero(acc > 0)[0]:
        out |= 1 << int(i)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# FNV-1a (code-point & 0xFF convention — same as textstats.rolling_fingerprint
# and reproducible bit-exactly in DuckDB SQL with HUGEINT arithmetic)
_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211
_U64 = (1 << 64) - 1


def fnv1a_u64(tok: str) -> int:
    h = _FNV_OFFSET
    for ch in tok:
        h = ((h ^ (ord(ch) & 0xFF)) * _FNV_PRIME) & _U64
    return h


def simhash_fnv(s: str, n: int = 3, _cache: dict | None = None) -> int:
    """Charikar SimHash with the FNV-1a token hash — the SQL-oracle-exact
    variant of ``simhash`` (which uses pandas siphash, not expressible in
    SQL).  Shingle MULTIPLICITY weights the bit votes, matching a plain
    per-occurrence sum on both sides.  ``_cache`` memoizes token hashes
    (char n-gram vocabulary is bounded, so a per-actor dict stays small)."""
    from collections import Counter

    counts = Counter(shingles(s, n))
    if not counts:
        return 0
    if _cache is None:
        hs_list = [fnv1a_u64(t) for t in counts]
    else:
        hs_list = []
        for t in counts:
            h = _cache.get(t)
            if h is None:
                h = _cache[t] = fnv1a_u64(t)
            hs_list.append(h)
    hs = np.array(hs_list, dtype=np.uint64)
    w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    bitmat = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = (np.where(bitmat.astype(bool), 1, -1) * w[:, None]).sum(axis=0)
    out = 0
    for i in np.nonzero(acc > 0)[0]:
        out |= 1 << int(i)
    return out
