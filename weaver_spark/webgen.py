"""Deterministic synthetic web graph + image/caption payload generator.

Implements FIXTURES.md §1/§3: a closed two-plus-level web (root pages link
to leaf pages and optionally to deeper root pages, mirroring the
reference's search-page -> product-page structure,
``/root/reference/src/scrapper/amazonRootHandler.go:36-43``,
``neweggRootHandler.go:19-24``), with:

- Zipf-skewed host assignment (host h0 owns ~half the leaf URLs — the
  mega-host skew fixture the politeness/salting path must survive),
- ~20% duplicate links (same leaf linked from several roots) to exercise
  the frontier's no-dedup semantics and the storage-key anti-join,
- ~10% alias leaves (distinct URLs sharing an image_id) so URL-dedup and
  storage-key-dedup are distinguishable,
- a small fraction of "messy" link spellings (uppercase host, :80 port,
  utm params, fragments) that canonicalize to the clean URL,
- image payloads that are a pure function of image_id (seeded gradient +
  noise, sizes 32..96, fmt cycling png/jpeg) — generated INSIDE the fetch
  UDF on executors, so the bench never ships pixels through the driver.

Everything is a pure function of (seed, shape params): no wall clock, no
global RNG.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .codec import phash64, png_encode, quantize_lossy

_FMTS = ("png", "jpeg")


def image_fmt(image_id: str) -> str:
    return _FMTS[int(image_id.split("_")[1]) % 2]


def image_caption(image_id: str, host: str) -> str:
    i = int(image_id.split("_")[1])
    return f"synthetic caption {i} for host {host}"


# Base gradient depends only on `side` (5 distinct values) — cached, so the
# per-image work is one float32 noise draw + in-place add/clip. The fetch UDF
# is memory-bandwidth-bound at 32-way occupancy (BENCH/BASELINE.md); float32
# everywhere + zero redundant temporaries is what the N→4N scaling ratio
# actually responds to, not CPU micro-optimizations.
_BASE_CACHE: dict[int, np.ndarray] = {}


def _base_gradient(side: int) -> np.ndarray:
    b = _BASE_CACHE.get(side)
    if b is None:
        xx = np.arange(side, dtype=np.float32)
        yy = xx[:, None]
        b = np.empty((side, side, 3), np.float32)
        b[..., 0] = xx * np.float32(255.0 / side)
        b[..., 1] = yy * np.float32(255.0 / side)
        b[..., 2] = (xx + yy) * np.float32(255.0 / (2 * side))
        _BASE_CACHE[side] = b
    return b


def gen_pixels(image_id: str, seed: int = 42) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for an image_id."""
    i = int(image_id.split("_")[1])
    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
    side = 32 + (i % 5) * 16  # 32..96
    px = rng.standard_normal((side, side, 3), dtype=np.float32)
    px *= np.float32(12.0)
    px += _base_gradient(side)
    np.clip(px, 0, 255, out=px)
    return px.astype(np.uint8)


def gen_payload(image_id: str, seed: int = 42) -> tuple[bytes, int, int, str, int]:
    """(bytes, w, h, fmt, phash) for an image_id — the fetch UDF's work.

    phash is computed from the post-quantization pixels for the lossy fmt —
    identical to the decoded payload (the lossy container is quantize-then-
    lossless-pack, so decode(encode(q)) == q; asserted in tests) — so engine
    and oracle hash identical pixels without a redundant decode pass.
    """
    px = gen_pixels(image_id, seed)
    fmt = image_fmt(image_id)
    if fmt == "jpeg":
        px = quantize_lossy(px)
        payload = b"WJPG" + png_encode(px)
    else:
        payload = png_encode(px)
    h, w = px.shape[:2]
    return payload, int(w), int(h), fmt, phash64(px)


@dataclass
class SyntheticWeb:
    """The generated graph: page dicts + seed URL list."""

    seeds: list[str]
    # url -> {"kind": root|leaf, "links": [raw link spellings], "image_id",
    #         "caption"} — links are RAW (possibly messy) spellings.
    pages: dict[str, dict] = field(default_factory=dict)
    seed: int = 42

    def page_rows(self) -> list[tuple]:
        """Rows for the web_pages table (payload generated lazily in UDF)."""
        return [
            (
                url,
                p["kind"],
                p.get("links"),
                p.get("image_id"),
                None,
                image_fmt(p["image_id"]) if p.get("image_id") else None,
                p.get("caption"),
            )
            for url, p in self.pages.items()
        ]


def make_robots(
    n_hosts: int = 8,
    disallow_hosts: tuple[int, ...] = (1, 3),
    slow_host: int = 0,
    crawl_delay_ms: int = 2500,
    allow_spec: dict[int, list[str]] | None = None,
) -> list[tuple]:
    """Per-host robots fixture rows (ROBOTS_SCHEMA; FIXTURES.md §4):
    a few hosts disallow /item/ (their leaves are never fetched), the
    mega-host gets a large crawl_delay (politeness cap 1/round at the
    default 1 s scheduler tick), the rest are unrestricted. Default rows
    are 3-tuples (no Allow — byte-stable with pre-Allow fixtures);
    ``allow_spec`` (host index -> Allow prefixes) emits 4-tuples for the
    named hosts to exercise longest-match precedence (e.g. disallow
    ``/item/`` but allow ``/item/1`` re-opens leaves item/1, item/1x,
    ...)."""
    rows = []
    for k in range(n_hosts):
        prefixes = ["/item/"] if k in disallow_hosts else []
        delay = crawl_delay_ms if k == slow_host else 0
        if allow_spec and k in allow_spec:
            rows.append((f"h{k}.test", prefixes, delay, list(allow_spec[k])))
        else:
            rows.append((f"h{k}.test", prefixes, delay))
    return rows


def _zipf_host(rng: np.random.Generator, n_hosts: int) -> int:
    """Host index with ~50% mass on host 0, long tail over the rest."""
    if rng.random() < 0.5:
        return 0
    return 1 + int(rng.integers(0, n_hosts - 1)) if n_hosts > 1 else 0


def _messy(url: str, rng: np.random.Generator) -> str:
    """A raw spelling that canonicalizes back to `url`."""
    r = rng.random()
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    if r < 0.25:
        return f"{scheme}://{host.upper()}/{path}"
    if r < 0.5:
        return f"{scheme}://{host}:80/{path}"
    if r < 0.75:
        return f"{url}?utm_source=feed&utm_campaign=x"
    return f"{url}#frag"


def make_web_df(
    spark,
    n_roots: int = 1000,
    leaves_per_root: int = 400,
    n_hosts: int = 64,
    dup_every: int = 10,
):
    """Distributed synthetic web: the web_pages DataFrame is generated
    JVM-side from id ranges (no driver loop, no pixel bytes — payloads
    are synthesized in the fetch UDF). Two-level structure: root r links
    to leaves [r*L, (r+1)*L); every `dup_every`-th link slot points at
    the previous leaf instead (duplicate links across the corpus).

    Returns (seed_urls, web_pages_df). Used for throughput/scaling
    benches where the graph need not fit in the driver; correctness runs
    use make_web + the Python simulator instead.
    """
    from pyspark.sql import functions as F

    roots = spark.range(n_roots).select(
        F.format_string("http://h%d.test/cat/%d", F.col("id") % n_hosts, F.col("id")).alias("url"),
        F.lit("root").alias("kind"),
        F.transform(
            # effective target id: every dup_every-th slot re-links the
            # previous leaf (cross-root duplicate links)
            F.transform(
                F.sequence(
                    F.col("id") * leaves_per_root,
                    (F.col("id") + 1) * leaves_per_root - 1,
                ),
                lambda i: F.when((i % dup_every == 0) & (i > 0), i - 1).otherwise(i),
            ),
            lambda j: F.format_string(
                "http://h%d.test/item/%d",
                F.pmod(F.xxhash64(j.cast("string")), F.lit(n_hosts)),
                j,
            ),
        ).alias("links"),
        F.lit(None).cast("string").alias("image_id"),
        F.lit(None).cast("binary").alias("payload"),
        F.lit(None).cast("string").alias("fmt"),
        F.lit(None).cast("string").alias("caption"),
    )
    n_leaves = n_roots * leaves_per_root
    leaves = spark.range(n_leaves).select(
        F.format_string(
            "http://h%d.test/item/%d",
            F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(n_hosts)),
            F.col("id"),
        ).alias("url"),
        F.lit("leaf").alias("kind"),
        F.lit(None).cast("array<string>").alias("links"),
        F.format_string("img_%08d", F.col("id")).alias("image_id"),
        F.lit(None).cast("binary").alias("payload"),
        F.when(F.col("id") % 2 == 0, "png").otherwise("jpeg").alias("fmt"),
        F.format_string("synthetic caption %d", F.col("id")).alias("caption"),
    )
    seeds = [f"http://h{r % n_hosts}.test/cat/{r}" for r in range(n_roots)]
    return seeds, roots.unionByName(leaves)


def _deep_level_offsets(n_seed_roots: int, child_roots: int, depth: int):
    """Global root-id offset of each level: level d has S * C^d roots."""
    offs, count = [], n_seed_roots
    acc = 0
    for _ in range(depth):
        offs.append(acc)
        acc += count
        count *= child_roots
    return offs, acc  # (per-level offsets, total roots)


def make_deep_web_df(
    spark,
    n_seed_roots: int = 6,
    child_roots: int = 3,
    depth: int = 4,
    leaves_per_root: int = 300,
    n_hosts: int = 32,
):
    """Distributed DEEP synthetic web: a ``depth``-level root tree (every
    root at level d < depth-1 links to ``child_roots`` sub-roots) where
    each root also owns ``leaves_per_root`` leaves. Exercises multi-hop
    discovery and the depth-decay priority source at bench scale — the
    two-level make_web_df web drains in 2 rounds and never runs either.

    Same JVM-side id-range generation as make_web_df (no driver loop, no
    pixel bytes). Root (level d, local i, global g = off_d + i) links to
    child roots off_{d+1} + i*C .. +C-1 and leaves g*L .. (g+1)*L-1.
    ``make_deep_web`` is the driver-side mirror with identical URLs for
    simulator-parity tests.

    Returns (seed_urls, web_pages_df).
    """
    from pyspark.sql import functions as F

    offs, total_roots = _deep_level_offsets(n_seed_roots, child_roots, depth)

    def root_url(gid_col):
        return F.format_string(
            "http://h%d.test/cat/%d", gid_col % n_hosts, gid_col
        )

    def leaf_url(j):
        # round-robin host assignment (j % H): same host diversity as a
        # hash for ranged ids, and trivially mirrored by make_deep_web
        return F.format_string(
            "http://h%d.test/item/%d", F.pmod(j, F.lit(n_hosts)), j
        )

    level_dfs = []
    count = n_seed_roots
    for d in range(depth):
        g = F.col("id") + F.lit(offs[d])
        leaf_links = F.transform(
            F.sequence(
                g * leaves_per_root, (g + F.lit(1)) * leaves_per_root - 1
            ),
            leaf_url,
        )
        if d < depth - 1:
            child_links = F.transform(
                F.sequence(
                    F.lit(offs[d + 1]) + F.col("id") * child_roots,
                    F.lit(offs[d + 1]) + F.col("id") * child_roots + child_roots - 1,
                ),
                root_url,
            )
            links = F.concat(child_links, leaf_links)
        else:
            links = leaf_links
        level_dfs.append(
            spark.range(count).select(
                root_url(g).alias("url"),
                F.lit("root").alias("kind"),
                links.alias("links"),
                F.lit(None).cast("string").alias("image_id"),
                F.lit(None).cast("binary").alias("payload"),
                F.lit(None).cast("string").alias("fmt"),
                F.lit(None).cast("string").alias("caption"),
            )
        )
        count *= child_roots
    n_leaves = total_roots * leaves_per_root
    leaves = spark.range(n_leaves).select(
        leaf_url(F.col("id")).alias("url"),
        F.lit("leaf").alias("kind"),
        F.lit(None).cast("array<string>").alias("links"),
        F.format_string("img_%08d", F.col("id")).alias("image_id"),
        F.lit(None).cast("binary").alias("payload"),
        F.when(F.col("id") % 2 == 0, "png").otherwise("jpeg").alias("fmt"),
        F.format_string("synthetic caption %d", F.col("id")).alias("caption"),
    )
    web_df = level_dfs[0]
    for df in level_dfs[1:]:
        web_df = web_df.unionByName(df)
    seeds = [f"http://h{r % n_hosts}.test/cat/{r}" for r in range(n_seed_roots)]
    return seeds, web_df.unionByName(leaves)


def make_deep_web(
    n_seed_roots: int = 2,
    child_roots: int = 2,
    depth: int = 4,
    leaves_per_root: int = 3,
    n_hosts: int = 4,
    seed: int = 42,
) -> SyntheticWeb:
    """Driver-side mirror of make_deep_web_df: byte-identical URL/link/
    image_id/caption scheme, as a SyntheticWeb the pure-Python simulator
    can crawl — the parity oracle for the deep bench leg."""
    offs, total_roots = _deep_level_offsets(n_seed_roots, child_roots, depth)
    web = SyntheticWeb(seeds=[], seed=seed)

    def leaf_url(j: int) -> str:
        return f"http://h{j % n_hosts}.test/item/{j}"

    count = n_seed_roots
    for d in range(depth):
        for i in range(count):
            g = offs[d] + i
            links = []
            if d < depth - 1:
                links += [
                    f"http://h{(offs[d + 1] + i * child_roots + j) % n_hosts}"
                    f".test/cat/{offs[d + 1] + i * child_roots + j}"
                    for j in range(child_roots)
                ]
            links += [
                leaf_url(j)
                for j in range(g * leaves_per_root, (g + 1) * leaves_per_root)
            ]
            web.pages[f"http://h{g % n_hosts}.test/cat/{g}"] = {
                "kind": "root",
                "links": links,
            }
        count *= child_roots
    for j in range(total_roots * leaves_per_root):
        web.pages[leaf_url(j)] = {
            "kind": "leaf",
            "image_id": f"img_{j:08d}",
            "caption": f"synthetic caption {j}",
        }
    web.seeds = [
        f"http://h{r % n_hosts}.test/cat/{r}" for r in range(n_seed_roots)
    ]
    return web


def make_web(
    seed: int = 42,
    n_hosts: int = 8,
    n_seed_roots: int = 4,
    depth: int = 2,
    child_roots: int = 2,
    leaves_per_root: tuple[int, ...] = (3, 6),
    dup_frac: float = 0.2,
    alias_frac: float = 0.1,
    messy_frac: float = 0.3,
) -> SyntheticWeb:
    """Build the deterministic closed web.

    Roots at depth d < `depth` link to `child_roots` deeper roots plus
    k leaf links where k cycles through `leaves_per_root` (the reference's
    3/6 fan-out caps, ``amazonRootHandler.go:34`` / ``neweggRootHandler.go:20``).
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    web = SyntheticWeb(seeds=[], seed=seed)
    next_leaf = 0
    next_image = 0
    leaf_urls: list[str] = []  # canonical leaf urls, for dup links
    root_counter = 0

    def new_leaf() -> str:
        nonlocal next_leaf, next_image
        k = _zipf_host(rng, n_hosts)
        url = f"http://h{k}.test/item/{next_leaf}"
        next_leaf += 1
        # alias: ~alias_frac of leaves reuse the previous image_id
        if leaf_urls and rng.random() < alias_frac:
            image_id = web.pages[leaf_urls[-1]]["image_id"]
        else:
            image_id = f"img_{next_image:08d}"
            next_image += 1
        web.pages[url] = {
            "kind": "leaf",
            "image_id": image_id,
            "caption": image_caption(image_id, f"h{k}.test"),
        }
        leaf_urls.append(url)
        return url

    def new_root(d: int) -> str:
        nonlocal root_counter
        k = _zipf_host(rng, n_hosts)
        url = f"http://h{k}.test/cat/{root_counter}"
        root_counter += 1
        n_leaves = leaves_per_root[root_counter % len(leaves_per_root)]
        links: list[str] = []
        if d < depth:
            links.extend(new_root(d + 1) for _ in range(child_roots))
        for _ in range(n_leaves):
            if leaf_urls and rng.random() < dup_frac:
                target = leaf_urls[int(rng.integers(0, len(leaf_urls)))]
            else:
                target = new_leaf()
            links.append(target)
        # roughen some spellings — canonicalization must undo this
        links = [
            _messy(u, rng) if rng.random() < messy_frac else u for u in links
        ]
        web.pages[url] = {"kind": "root", "links": links}
        return url

    web.seeds = [new_root(1) for _ in range(n_seed_roots)]
    # one dummy seed for parity with the reference's discarded Amazon seed
    # (/root/reference/src/client/main.go:102): fetched, yields nothing.
    dummy = "http://h0.test/dummy/0"
    web.pages[dummy] = {"kind": "dummy"}
    web.seeds.append(dummy)
    return web
