"""Engine configuration.

Mirrors the reference CLI surface (reference src/humid.cc:413-429:
-n word length, -m mismatches, -e edit distance, -x maximum clustering,
-q/-a/-s output modes) plus the web-scale knobs the reference lacks
(shingles, MinHash, LSH bands, skew caps, checkpointing).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- reference-parity key construction (SURVEY.md §2.2) ---
    word_length: int = 24          # -n  (reference default, src/humid.cc:419)
    mismatches: int = 1            # -m  (src/humid.cc:420)
    use_edit: bool = False         # -e  Levenshtein instead of Hamming (src/humid.cc:426)
    max_clustering: bool = False   # -x  flood-fill instead of directional (src/humid.cc:427)
    pad_char: str = "N"            # pad char poisons the word (src/fastq.cc:151-159)
    alphabet: str | None = None    # if set (e.g. "ACGT"), keys with chars outside
                                   # the alphabet are unusable (word.filtered analog);
                                   # None = engine mode: any text, usable iff
                                   # length(text) >= word_length
    url_key_prefix: bool = False   # UMI-analog: prepend last _/:-field of url when
                                   # it matches ^[ACGT]+$ (reference src/fastq.cc:72-93)
    peek_umi: bool = False         # S2 probe: measure the token length from the
                                   # FIRST record (peekUMI, src/humid.cc:24-33) and
                                   # make every row contribute exactly that many
                                   # token chars (reference-exact preCompute split;
                                   # requires url_key_prefix)

    # --- output modes (reference -q/-a/-s) ---
    write_dedup: bool = True
    write_annotated: bool = False
    write_stats: bool = False

    # --- web-scale signature config (engine mode, SURVEY.md §7.2 M2-3) ---
    shingle_k: int = 5
    num_perm: int = 128
    minhash_scheme: str = "kperm"  # "kperm" (classic k-permutation,
                                   # compute-bound): the shipped default —
                                   # the scheme whose single-box scaling
                                   # mirrors a real N->4N cluster (passed
                                   # the 0.8 gate in rounds 1-2: 0.837 /
                                   # 0.819; fresh round-4 numbers 0.70-0.80
                                   # across three protocols on a decayed
                                   # host — full record in
                                   # BENCH/scaling.json + BASELINE.md).
                                   # "oph" (one-permutation +
                                   # densification) is the
                                   # absolute-throughput opt-in: 4-8x
                                   # faster per byte, but on a single box
                                   # it saturates the memory bus by 8
                                   # cores, so the measured single-host
                                   # efficiency reflects the bandwidth
                                   # ceiling, not the plan; it stays
                                   # opt-in because the flip criterion
                                   # (measured >=0.8 at 1->4) was not met.
    lsh_bands: int = 16            # bands * rows_per_band == num_perm
    jaccard_threshold: float = 0.8
    simhash_bits: int = 64

    # --- containment pass (winnowing; SURVEY.md §7.2 M4) ---
    canonicalize_urls: bool = False  # collapse key-space dups (case/port/
                                     # tracking-param/fragment/slash drift,
                                     # functions/urls.py) before doc ids
                                     # are assigned — variant fetches of
                                     # one page become ONE doc
    use_containment: bool = False
    containment_min_share: float = 0.7
    winnow_k: int = 8
    winnow_w: int = 16

    # --- skew / scale safety (SURVEY.md §4.3.6) ---
    bucket_cap: int = 2000         # max rows per LSH bucket before demotion
    lsh_salts: int = 8             # salt count for hot-bucket self-joins
    max_component_nodes: int = 2_000_000   # giant-component fallback threshold
    shuffle_partitions: int | None = None  # None -> session default

    # --- resumability ---
    checkpoint_dir: str | None = None

    def __post_init__(self) -> None:
        if self.num_perm % self.lsh_bands != 0:
            raise ValueError("num_perm must be divisible by lsh_bands")
        if self.word_length <= 0 or self.mismatches < 0:
            raise ValueError("word_length > 0 and mismatches >= 0 required")
        if self.peek_umi and not self.url_key_prefix:
            raise ValueError("peek_umi requires url_key_prefix")

    @property
    def rows_per_band(self) -> int:
        return self.num_perm // self.lsh_bands

    def config_hash(self) -> str:
        """Stable hash for checkpoint keys: a changed config never reuses
        stale snapshots (SURVEY.md §7.4.4)."""
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


REFERENCE_DEFAULTS = DedupConfig(alphabet="ACGT")
