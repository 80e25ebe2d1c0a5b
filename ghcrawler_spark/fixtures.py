"""Deterministic synthetic fixtures (FIXTURES.md): the image+caption corpus,
the crawl-graph link table, and the seed list. Pure functions of
(seed, scale) — no external data, no wall clock.

The graph shape mirrors how ghcrawler's visitor map fans out children
(lib/visitorMap.js:140-390 defines repo → {issues, commits, ...}; here
host root page → 'pages' edges → 'images' edges). A Zipf(s) host-size
distribution provides the hot-host skew the politeness/salting operators
must survive (SURVEY.md §5 property test 4); ~20% of image URLs are
cross-linked from multiple pages to exercise dedup.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ghcrawler_spark.functions.images import phash64, png_encode
from ghcrawler_spark.functions.jpeg import jpeg_encode

WORDS = (
    "the a of and to in is on for with spark crawl frontier queue host image "
    "caption fetch page link graph tier politeness robots bloom filter seen "
    "batch round snapshot merge shuffle partition salt skew broadcast join"
).split()


def page_url(host: int, page: int) -> str:
    return f"http://h{host:04d}.test/p{page}"


def image_url(host: int, image_id: str) -> str:
    return f"http://h{host:04d}.test/img/{image_id}"


@dataclass
class CrawlFixture:
    corpus: pd.DataFrame  # image_id, bytes, w, h, fmt, caption, phash, url
    links: pd.DataFrame   # src_url, edge, dst_url, dst_type
    seeds: pd.DataFrame   # url, type, tier, policy_fetch, policy_freshness, map_path
    meta: dict = field(default_factory=dict)


def make_caption(rng: np.random.RandomState) -> str:
    n = rng.randint(4, 17)
    return " ".join(WORDS[i] for i in rng.randint(0, len(WORDS), n))


def make_image(
    rng: np.random.RandomState, lossy: bool
) -> tuple[bytes, bytes, int, int, str, int]:
    """Returns (payload_bytes, reference_png_bytes, w, h, fmt, phash).

    reference_png is the lossless encoding of the TRUE pixels — the
    validation target for the per-row invariant (decode(payload) vs
    decode(reference): PSNR=inf for png; for jpeg, REAL baseline-JFIF
    round-trip error — ≈53 dB at quality 100 on the noise fixture,
    comfortably above the 40 dB gate)."""
    w = int(rng.choice([16, 32, 64]))
    h = int(rng.choice([16, 32, 64]))
    pixels = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    ref_png = png_encode(pixels)
    if lossy:
        blob = jpeg_encode(pixels, quality=100)
        fmt = "jpeg"
    else:
        blob = ref_png
        fmt = "png"
    return blob, ref_png, w, h, fmt, phash64(pixels)


def generate(
    seed: int = 42,
    n_hosts: int = 8,
    pages_per_host_max: int = 6,
    images_per_page: int = 3,
    zipf_s: float = 1.2,
    dup_frac: float = 0.2,
    jpeg_frac: float = 0.1,
    n_seeds: int = 4,
) -> CrawlFixture:
    """Build the full fixture. Host p gets ~pages_per_host_max / rank^s pages
    (Zipf skew: host 0 is hot)."""
    rng = np.random.RandomState(seed)

    corpus_rows = []
    link_rows = []
    img_counter = 0
    all_images: list[tuple[int, str]] = []  # (host, image_id)

    for host in range(n_hosts):
        n_pages = max(1, int(round(pages_per_host_max / (host + 1) ** zipf_s * 2)))
        for page in range(n_pages):
            src = page_url(host, page)
            # page → page edges (ring + forward links within the host)
            for nxt in {(page + 1) % n_pages, (page * 2 + 1) % n_pages}:
                if nxt != page:
                    link_rows.append((src, "pages", page_url(host, nxt), "page"))
            # occasional cross-host edge
            if rng.rand() < 0.3:
                other = int(rng.randint(0, n_hosts))
                link_rows.append((src, "pages", page_url(other, 0), "page"))
            # occasional dangling image link (404 analog → outcome Missing)
            if rng.rand() < 0.1:
                link_rows.append(
                    (src, "images", image_url(host, f"imgGONE{page:04d}"), "image")
                )
            # page → image edges
            for _ in range(images_per_page):
                if all_images and rng.rand() < dup_frac:
                    ih, iid = all_images[rng.randint(0, len(all_images))]
                    link_rows.append((src, "images", image_url(ih, iid), "image"))
                    continue
                iid = f"img{img_counter:08d}"
                img_counter += 1
                lossy = rng.rand() < jpeg_frac
                blob, ref_png, w, h, fmt, ph = make_image(rng, lossy)
                caption = make_caption(rng)
                corpus_rows.append(
                    (iid, blob, ref_png, w, h, fmt, caption, ph, image_url(host, iid))
                )
                all_images.append((host, iid))
                link_rows.append((src, "images", image_url(host, iid), "image"))

    corpus = pd.DataFrame(
        corpus_rows,
        columns=[
            "image_id", "bytes", "ref_bytes", "w", "h", "fmt", "caption",
            "phash", "url",
        ],
    )
    links = pd.DataFrame(
        link_rows, columns=["src_url", "edge", "dst_url", "dst_type"]
    ).drop_duplicates(ignore_index=True)
    seeds = pd.DataFrame(
        {
            "url": [page_url(h, 0) for h in range(min(n_seeds, n_hosts))],
            "type": "page",
            "tier": "normal",
            "policy_fetch": "originStorage",
            "policy_freshness": "match",
            "map_path": "/",
        }
    )
    return CrawlFixture(
        corpus=corpus,
        links=links,
        seeds=seeds,
        meta={"seed": seed, "n_hosts": n_hosts, "n_images": img_counter},
    )


CORPUS_SCHEMA = (
    "image_id string, bytes binary, ref_bytes binary, w int, h int, fmt string, "
    "caption string, phash long, url string"
)
LINKS_SCHEMA = "src_url string, edge string, dst_url string, dst_type string"
SEEDS_SCHEMA = (
    "url string, type string, tier string, policy_fetch string, "
    "policy_freshness string, map_path string"
)


def to_spark(spark, fx: CrawlFixture):
    """(corpus_df, links_df, seeds_df) as Spark DataFrames."""
    corpus = spark.createDataFrame(fx.corpus, schema=CORPUS_SCHEMA)
    links = spark.createDataFrame(fx.links, schema=LINKS_SCHEMA)
    seeds = spark.createDataFrame(fx.seeds, schema=SEEDS_SCHEMA)
    return corpus, links, seeds
