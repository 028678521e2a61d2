"""Engine configuration (the rebuild of the reference's ``config.py``).

Mirrors the tunables in ``/root/reference/config.py:1-123`` (selector lists,
delays, extension maps, filename policy) and the per-script thresholds
(``advanced_cleaning.py:50-75``, ``aggressive_cleaning.py:51-69``,
``cleanup_dataset.py``, ``yolo_cat_detector.py:31-34``) as one frozen
dataclass passed to pipeline builders — no module-global mutable state.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Content-Type -> file extension (reference: config.py:117-123 and the inline
# variant at comprehensive_scraper.py:232-240; default '.jpg').
CONTENT_TYPE_TO_EXTENSION = {
    "image/jpeg": ".jpg",
    "image/jpg": ".jpg",
    "image/png": ".png",
    "image/gif": ".gif",
    "image/webp": ".webp",
}
DEFAULT_IMAGE_EXTENSION = ".jpg"

# Image-harvest selector list, in priority order (reference:
# comprehensive_scraper.py:163-174). Each entry is either
# ("src_contains", substr) or ("ancestor_class", classname) — the regex-free
# re-expression of the reference's CSS selectors over our deterministic
# parser (functions/htmlkit.py).
IMAGE_SELECTORS: tuple[tuple[str, str], ...] = (
    ("src_contains", "cat"),
    ("src_contains", "foster"),
    ("ancestor_class", "cat-image"),
    ("ancestor_class", "profile-image"),
    ("ancestor_class", "gallery"),
    ("ancestor_class", "photo"),
    ("src_contains", ".jpg"),
    ("src_contains", ".jpeg"),
    ("src_contains", ".png"),
    ("src_contains", ".webp"),
)

# Image keep-predicate substrings / extensions
# (reference: comprehensive_scraper.py:184-187).
IMAGE_KEEP_SUBSTRINGS = ("cat", "foster")
IMAGE_KEEP_EXTENSIONS = (".jpg", ".jpeg", ".png", ".webp")

# Frontier link pattern (reference: smart_cat_discovery.py:138 — anchors with
# href matching /foster/\d+/ ) and listing pagination links.
FOSTER_LINK_RE = r"/foster/(\d+)/"
LISTING_LINK_RE = r"/foster/cat/\?p=(\d+)"

# Metadata selectors (reference: smart_cat_discovery.py:228-243):
# name  = first h1/h2/h3 whose class matches r'title|name'
# desc  = first div/p whose class matches r'description|desc|content'
# details = all div/span whose class matches r'detail|info|attribute',
#           text containing ':' split once.
NAME_TAGS = ("h1", "h2", "h3")
NAME_CLASS_RE = r"title|name"
DESC_TAGS = ("div", "p")
DESC_CLASS_RE = r"description|desc|content"
DETAIL_TAGS = ("div", "span")
DETAIL_CLASS_RE = r"detail|info|attribute"
RELATED_CLASS_RE = r"related|similar|recommend"

# Name-field coalesce order (reference: reorganize_dataset.py:44-52).
NAME_COALESCE_FIELDS = ("name", "cat_name", "title", "catch_copy")

# --- cleaning thresholds -------------------------------------------------


@dataclass(frozen=True)
class AdvancedCleaningConfig:
    """Thresholds of /root/reference/advanced_cleaning.py:50-75."""

    min_file_size: int = 5000
    max_file_size: int = 50 * 1024 * 1024
    min_width: int = 100
    min_height: int = 100
    max_width: int = 10000
    max_height: int = 10000
    min_aspect_ratio: float = 0.1
    max_aspect_ratio: float = 10.0
    non_cat_patterns: tuple[str, ...] = (
        "icon", "button", "banner", "logo", "avatar", "profile",
        "noimage", "placeholder", "default", "empty", "loading",
        "spacer", "pixel", "transparent", "blank", "sample",
    )
    suspicious_sizes: tuple[int, ...] = (
        43, 172, 281, 364, 883, 1300, 1500, 1900, 3400, 4000, 4058,
        4500, 5200, 5871, 6300, 6400, 6490, 6700, 6900, 7200,
    )


@dataclass(frozen=True)
class AggressiveCleaningConfig:
    """Thresholds of /root/reference/aggressive_cleaning.py:51-69."""

    min_file_size: int = 10000
    max_file_size: int = 20 * 1024 * 1024
    min_width: int = 300
    min_height: int = 300
    max_width: int = 8000
    max_height: int = 8000
    min_aspect_ratio: float = 0.3
    max_aspect_ratio: float = 3.0
    problematic_sizes: tuple[int, ...] = (
        5276, 6490, 5871, 4058, 4560, 3480, 1964, 4634, 2713, 883,
        1505, 1320, 2326, 4356,
    )
    uniform_color_frac: float = 0.8   # aggressive_cleaning.py:131-134
    alpha_max_transparent: int = 50   # aggressive_cleaning.py:115-117


@dataclass(frozen=True)
class HeuristicCleanupConfig:
    """Thresholds of /root/reference/cleanup_dataset.py:75-190."""

    non_cat_patterns: tuple[str, ...] = (
        "ad", "advertisement", "banner", "logo", "icon", "button",
        "thumb", "thumbnail", "preview", "placeholder", "dummy",
        "loading", "error", "404", "noimage", "default",
        "illustration", "drawing", "cartoon", "anime", "manga",
        "graphic", "design", "art", "painting",
    )
    cat_patterns: tuple[str, ...] = (
        "cat", "foster", "pet", "animal", "kitten", "kitty",
    )
    warm_ratio_threshold: float = 0.1
    keep_score: int = 3   # score >= 3 -> keep
    drop_score: int = 1   # score <= 1 -> drop; 2 is borderline-keep


@dataclass(frozen=True)
class ScorerConfig:
    """Thresholds of /root/reference/yolo_cat_detector.py:31-34,51."""

    confidence_threshold: float = 0.3
    cat_class_id: int = 16


# --- crawl configuration -------------------------------------------------


@dataclass(frozen=True)
class CrawlConfig:
    """Frontier / fetch-scheduler configuration.

    ``host_budget_per_round`` is the deterministic politeness stand-in for
    the reference's random inter-request sleeps
    (comprehensive_scraper.py:252,329-331): at most this many fetches per
    true host per BFS round; rows over budget stay pending and keep their
    ``discovery_seq``, so crawl order is a pure function of the seed list +
    budget. ``host_salt_buckets`` spreads one dominant host over S
    sub-buckets before the groupby(host) shuffle (skew defusal) — budgets
    are enforced per TRUE host after re-aggregation, so salting never
    changes semantics, only parallelism.
    """

    host_budget_per_round: int = 64
    max_rounds: int = 50
    target_urls: int | None = None   # early stop (comprehensive_scraper.py:334-336)
    seen_shards: int = 4
    seen_mode: str = "exact"         # "exact" | "cuckoo"
    # cuckoo capacity per shard; size with ~1.25x headroom over the
    # expected URLs/shard (SURVEY.md §4: 16 shards x ~10^9 for a 10^10
    # frontier at ~16 bits/key)
    seen_capacity_per_shard: int = 1_000_000
    host_salt_buckets: int = 8
    fetch_concurrency: int = 4
    fetch_batch_size: int = 256
    extract_batch_size: int = 256
    page_store_buckets: int = 16
    # Honor robots.txt (fetched + parsed once per host per fetch worker,
    # the ST1-style cache the north_star names). Denied URLs get
    # fetch_status='robots_denied' and are never fetched or expanded.
    respect_robots: bool = True
    # False = "fetch list" mode: visit the frontier but do not enqueue
    # discovered links (a Common-Crawl-style refetch job; the headline
    # throughput benchmark uses it so the measured stage is fetch+extract).
    expand_links: bool = True
    # BFS engine for expand_links=True. None = AUTO (the default): route
    # by seed-frontier size — at or above ``streamed_bfs_threshold`` rows
    # the STREAMED control plane runs (frontier as Dataset/parquet,
    # task-side seen anti-join and visit shards, driver bounded by
    # hosts+ranges — the 10^10-scale path); below it the classic
    # driver-loop BFS runs (control plane bounded by budget x hosts x
    # rounds, fixed per-round cost ~0, the right engine for small crawls).
    # True/False force one engine. Both are oracle-equal (tests pin
    # equality across budgets/robots/targets/random sites).
    streamed_bfs: bool | None = None
    # AUTO cutover: a seed frontier at/above this many rows takes the
    # streamed BFS. Sized where the streamed plane's fixed per-round cost
    # (a few seconds) amortizes against per-row work.
    streamed_bfs_threshold: int = 100_000
    # Rounds with fewer work rows than this run fetch+extract inline on the
    # driver (identical code path, same results) instead of paying a
    # per-round Ray Data job. Large rounds — the ones that matter at 10^10
    # scale — always take the distributed path. Set to 0 to force the
    # distributed path everywhere (tests do).
    small_round_threshold: int = 4096
    # The budget/priority control plane (groupby-host top-B) is a cheap
    # driver-side sort below this row count; above it, the salted-groupby
    # Ray shuffle runs. Distinct from small_round_threshold because the
    # control plane is pure metadata (no html bytes) — inline wins far
    # longer. 0 forces the distributed path (tests).
    control_inline_threshold: int = 200_000


DEFAULT_ADVANCED = AdvancedCleaningConfig()
DEFAULT_AGGRESSIVE = AggressiveCleaningConfig()
DEFAULT_HEURISTIC = HeuristicCleanupConfig()
DEFAULT_SCORER = ScorerConfig()
DEFAULT_CRAWL = CrawlConfig()
