"""Deterministic synthetic Common-Crawl-style site + image corpus.

BASELINE.json ``input_hint``: the engine's input is a Parquet table of pages
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.
This module synthesizes that table as a seeded linked site graph mirroring
the reference site's shape (FIXTURES.md §1):

- one dominant host (``www.neko-jirushi.com`` — the single-site skew case the
  north_rule calls out) plus a small tail of minor mirror hosts;
- listing pages ``/foster/cat/?p=N`` each linking 22 detail pages
  (comprehensive_scraper.py:299 — 22 cats/page) and the next listing page;
- detail pages ``/foster/<id>/`` with name/description/detail metadata nodes
  (selector classes per smart_cat_discovery.py:228-243), image tags matching
  the harvest selector cascade (comprehensive_scraper.py:163-174) including
  planted duplicates and non-cat decoys, related-section cross links, and
  Japanese text;
- a fraction of linked URLs intentionally absent from the table (404s).

Everything is a pure function of (seed, size parameters): no wall clock, no
global RNG. ``text`` is filled with the oracle extraction
(``functions.htmlkit.extract_text``) so the byte-identical invariant is
checkable directly against the table.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import random

import pyarrow as pa

from .config import DEFAULT_ADVANCED, DEFAULT_AGGRESSIVE
from .functions import imagekit
from .functions.htmlkit import extract_text

DOMINANT_HOST = "https://www.neko-jirushi.com"
MINOR_HOSTS = tuple(f"https://cats{k}.example.org" for k in range(1, 4))
BASE_TS = _dt.datetime(2025, 8, 1, 0, 0, 0)

_JP_NAMES = (
    "ミケ", "タマ", "クロ", "シロ", "トラ", "モモ", "ハナ", "コテツ",
    "チャチャ", "ソラ", "レオ", "ルナ", "マロン", "キナコ", "アズキ",
)
_JP_PHRASES = (
    "人懐っこい性格です", "とても元気な子猫です", "ワクチン接種済み",
    "譲渡条件があります", "トライアル可能です", "兄弟で応募できます",
    "甘えん坊な男の子", "おとなしい女の子です",
)
_EN_WORDS = (
    "gentle", "playful", "rescued", "vaccinated", "litter", "trained",
    "indoor", "friendly", "adopted", "foster", "kitten", "senior",
    "tabby", "calico", "shelter", "volunteer", "home", "family",
)
_COLORS = ("黒", "白", "キジトラ", "茶トラ", "三毛", "サビ", "灰色")
_SEXES = ("オス", "メス")


def _para(rng: random.Random, lang: str) -> str:
    if lang == "ja":
        return "。".join(rng.choice(_JP_PHRASES) for _ in range(rng.randint(2, 5))) + "。"
    return " ".join(rng.choice(_EN_WORDS) for _ in range(rng.randint(8, 30))) + "."


def _detail_html(
    rng: random.Random,
    host: str,
    cat_id: int,
    all_ids: list[int],
    lang: str,
    extra_text: str = "",
) -> str:
    name = rng.choice(_JP_NAMES)
    age = f"{rng.randint(0, 15)}歳"
    sex = rng.choice(_SEXES)
    color = rng.choice(_COLORS)
    desc = _para(rng, lang)
    body = " ".join(_para(rng, lang) for _ in range(rng.randint(1, 3)))
    related = rng.sample(all_ids, k=min(len(all_ids), rng.randint(2, 5)))
    rel_links = "".join(
        f'<a href="/foster/{r}/">関連の猫 {r}</a> ' for r in related
    )
    # image block exercises the full selector cascade + keep predicate:
    #  - main foster jpg (src contains 'foster' + '.jpg')
    #  - gallery png inside div.gallery
    #  - lazy data-src webp inside div.photo
    #  - an exact duplicate of the main image (keep-first dedup, M10)
    #  - a logo gif decoy (fails the keep predicate: no cat/foster, .gif)
    #  - an external absolute image on some pages
    ext_img = (
        f'<img src="{rng.choice(MINOR_HOSTS)}/img/cat/{cat_id}_x.jpg" alt="mirror">'
        if rng.random() < 0.2
        else ""
    )
    return f"""<!DOCTYPE html>
<html><head><title>{name} | 里親募集 {cat_id}</title>
<style>body {{ color: #333 }}</style>
<script>var trackingId = {cat_id};</script>
</head><body>
<div class="header"><img src="/img/logo.gif" alt="site logo"></div>
<h1 class="cat-title">{name}（ID: {cat_id}）</h1>
<div class="description">{desc}</div>
<div class="detail">年齢: {age}</div>
<span class="info">性別: {sex}</span>
<div class="attribute">毛色: {color}</div>
<div class="catphoto"><img src="/img/foster/{cat_id}_1.jpg" alt="{name}" title="{name}"></div>
<div class="gallery"><img src="/img/photo/{cat_id}_2.png" alt="photo2"><img src="/img/foster/{cat_id}_1.jpg" alt="{name}"></div>
<div class="photo"><img data-src="/img/photo/{cat_id}_3.webp" alt="lazy"></div>
{ext_img}
<p>{body}</p>
<p>{extra_text}</p>
<div class="related-cats">{rel_links}</div>
<div class="footer"><a href="/foster/cat/?p=1">一覧へ戻る</a></div>
</body></html>"""


def _listing_html(host: str, page_no: int, ids: list[int], last_page: int) -> str:
    rows = "".join(
        f'<div class="catlist"><a class="catlist_tit" href="/foster/{i}/">猫 {i}</a>'
        f'<img class="list-thumb" src="/img/foster/{i}_1.jpg" alt="thumb {i}"></div>'
        for i in ids
    )
    nxt = (
        f'<a class="next" href="/foster/cat/?p={page_no + 1}">次のページ</a>'
        if page_no < last_page
        else ""
    )
    return f"""<!DOCTYPE html>
<html><head><title>里親募集一覧 p{page_no}</title></head><body>
<h1 class="page-title">里親募集中の猫 ページ{page_no}</h1>
{rows}
{nxt}
</body></html>"""


def synth_pages(
    num_listing_pages: int = 5,
    cats_per_page: int = 22,
    seed: int = 42,
    missing_frac: float = 0.05,
    minor_host_pages: int = 6,
    texts: list[str] | None = None,
    robots_denied_every: int = 0,
) -> tuple[pa.Table, list[str]]:
    """Build the pages table and the seed-URL list.

    Returns ``(pages, seeds)`` where pages has the input_hint schema and
    seeds = the first listing page per host (dominant host first).
    Deterministic in all arguments.

    ``robots_denied_every``: if > 0, the dominant host publishes a
    robots.txt disallowing every Nth detail page (the pages still exist in
    the table — a compliant crawler must mark them robots_denied and never
    expand their links).
    """
    rng = random.Random(seed)
    first_id = 226_000
    n_cats = num_listing_pages * cats_per_page
    all_ids = list(range(first_id, first_id + n_cats))
    missing = set(
        i for i in all_ids if rng.random() < missing_frac
    )  # linked but absent → 404 analog

    urls: list[str] = []
    htmls: list[bytes] = []
    texts_out: list[str] = []
    langs: list[str] = []
    tss: list[_dt.datetime] = []

    def add(url: str, html: str, lang: str, ts_off: int) -> None:
        urls.append(url)
        htmls.append(html.encode("utf-8"))
        texts_out.append(extract_text(html))
        langs.append(lang)
        tss.append(BASE_TS + _dt.timedelta(seconds=ts_off))

    # robots.txt on the dominant host (plain-text page; the crawler's
    # fetch stage resolves it through the same page store)
    if robots_denied_every:
        denied_ids = [
            i for k, i in enumerate(all_ids) if k % robots_denied_every == 0
        ]
        robots_body = "User-agent: *\nDisallow: /private/\n" + "".join(
            f"Disallow: /foster/{i}/\n" for i in denied_ids
        )
        add(f"{DOMINANT_HOST}/robots.txt", robots_body, "en", 0)

    # listing pages on the dominant host
    for p in range(1, num_listing_pages + 1):
        ids = all_ids[(p - 1) * cats_per_page : p * cats_per_page]
        add(
            f"{DOMINANT_HOST}/foster/cat/?p={p}",
            _listing_html(DOMINANT_HOST, p, ids, num_listing_pages),
            "ja",
            p,
        )
    # detail pages on the dominant host
    for k, cat_id in enumerate(all_ids):
        if cat_id in missing:
            continue
        lang = "ja" if rng.random() < 0.8 else "en"
        extra = texts[k % len(texts)] if texts else ""
        add(
            f"{DOMINANT_HOST}/foster/{cat_id}/",
            _detail_html(rng, DOMINANT_HOST, cat_id, all_ids, lang, extra),
            lang,
            10_000 + cat_id - first_id,
        )
    # a small tail of minor-host mirror pages (skew: dominant host ~95%)
    for host in MINOR_HOSTS:
        for j in range(minor_host_pages):
            cat_id = all_ids[(j * 7) % n_cats]
            lang = "en"
            add(
                f"{host}/foster/{cat_id}/",
                _detail_html(rng, host, cat_id, all_ids, lang),
                lang,
                500_000 + j,
            )

    pages = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts_out, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
    seeds = [f"{DOMINANT_HOST}/foster/cat/?p=1"] + [
        f"{h}/foster/{all_ids[0]}/" for h in MINOR_HOSTS[:1]
    ]
    return pages, seeds


# --- synthetic image corpus for the cleaning/dedup/scoring stages ---------


def synth_images(
    num_cats: int = 40,
    images_per_cat: int = 8,
    seed: int = 43,
    good_size_range: tuple[int, int] = (15_000, 600_000),
) -> pa.Table:
    """Image records (FIXTURES.md §6) with planted edge cases: exact
    cross-cat duplicates, blacklist byte sizes, corrupt blobs, transparent
    RGBA, >80%-uniform color, out-of-range dimensions/aspects, and decoy
    filenames for the pattern filters."""
    rng = random.Random(seed)
    first_id = 226_000
    rows: dict[str, list] = {
        "img_url": [], "cat_id": [], "seq": [], "bytes": [], "fmt": [],
    }
    dup_pool: list[bytes] = []

    def emit(cat: int, seq: int, blob: bytes, fname: str, fmt: str) -> None:
        rows["img_url"].append(
            f"{DOMINANT_HOST}/img/foster/{cat}/{seq:03d}/{fname}"
        )
        rows["cat_id"].append(str(cat))
        rows["seq"].append(seq)
        rows["bytes"].append(blob)
        rows["fmt"].append(fmt)

    for c in range(num_cats):
        cat = first_id + c
        for s in range(1, images_per_cat + 1):
            roll = rng.random()
            fname = f"image_{s:03d}.jpg"
            fmt = "jpg"
            if roll < 0.55:  # a good image
                blob = imagekit.encode_fake_image(
                    width=rng.randint(400, 2000),
                    height=rng.randint(400, 2000),
                    mode="RGB",
                    top_color_frac=rng.uniform(0.05, 0.5),
                    warm_ratio=rng.uniform(0.15, 0.9),
                    target_size=rng.randint(*good_size_range),
                    payload_seed=f"{cat}/{s}".encode(),
                )
                if rng.random() < 0.15:
                    dup_pool.append(blob)
            elif roll < 0.62 and dup_pool:  # exact cross-cat duplicate
                blob = rng.choice(dup_pool)
            elif roll < 0.68:  # suspicious/blacklisted exact byte size
                size = rng.choice(
                    DEFAULT_ADVANCED.suspicious_sizes
                    + DEFAULT_AGGRESSIVE.problematic_sizes
                )
                blob = imagekit.encode_fake_image(
                    200, 200, target_size=size, payload_seed=f"s{cat}/{s}".encode()
                )
            elif roll < 0.73:  # tiny / bad aspect
                blob = imagekit.encode_fake_image(
                    width=rng.choice((40, 80, 3000)),
                    height=rng.choice((40, 60, 120)),
                    target_size=rng.randint(12_000, 30_000),
                    payload_seed=f"d{cat}/{s}".encode(),
                )
            elif roll < 0.78:  # mostly transparent RGBA
                blob = imagekit.encode_fake_image(
                    600, 600, mode="RGBA", alpha_max=10,
                    target_size=rng.randint(12_000, 30_000),
                    payload_seed=f"t{cat}/{s}".encode(),
                )
            elif roll < 0.83:  # uniform color (logo-like)
                blob = imagekit.encode_fake_image(
                    500, 500, top_color_frac=0.95,
                    target_size=rng.randint(12_000, 30_000),
                    payload_seed=f"u{cat}/{s}".encode(),
                )
            elif roll < 0.88:  # corrupt blob
                blob = b"GARBAGE" + hashlib.sha256(f"{cat}/{s}".encode()).digest()
            else:  # decoy filename (pattern filter)
                fname = rng.choice(
                    ("logo.png", "banner_ad.jpg", "icon_small.png", "loading.gif")
                )
                fmt = fname.rsplit(".", 1)[1]
                blob = imagekit.encode_fake_image(
                    350, 350, target_size=rng.randint(12_000, 30_000),
                    payload_seed=f"p{cat}/{s}".encode(),
                )
            emit(cat, s, blob, fname, fmt)

    sizes = [len(b) for b in rows["bytes"]]
    md5s = [hashlib.md5(b).digest() for b in rows["bytes"]]
    return pa.table(
        {
            "img_url": pa.array(rows["img_url"], type=pa.string()),
            "cat_id": pa.array(rows["cat_id"], type=pa.string()),
            "seq": pa.array(rows["seq"], type=pa.int32()),
            "bytes": pa.array(rows["bytes"], type=pa.binary()),
            "size": pa.array(sizes, type=pa.int64()),
            "fmt": pa.array(rows["fmt"], type=pa.string()),
            "md5": pa.array(md5s, type=pa.binary()),
        }
    )
