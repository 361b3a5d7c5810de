"""Deterministic synthetic corpora for tests and benchmarks (FIXTURES.md).

Generates the Common-Crawl-style ``pages`` table mandated by BASELINE.json
``input_hint`` — (url, warc_ts, html, text, lang) — with seeded duplicate
injection over the noise classes the reference normalizer handles
(/root/reference/backend/dedupe_script.py:18-31): accents, case flips,
space runs, newlines, wrapping quotes, 'nan'/empty fields, plus token swaps
and small typos. Companion tables: ``pages_truth(url, true_cluster_id)`` and
``labeled_pairs(url1, url2, label)`` (FIXTURES.md F2).

All randomness flows from one seed — identical output on every call.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

_VOCAB = (
    "spark data table query join scan filter group sort hash merge window "
    "stream batch row column value key part order line customer supplier "
    "engine cluster block score match record page crawl index token shard "
    "alpha beta gamma delta epsilon zeta theta kappa lambda sigma omega "
    "north south east west river mountain forest harbor bridge tower garden"
).split()

_ACCENT = {"a": "á", "e": "é", "i": "í", "o": "ö", "u": "ü", "n": "ñ", "c": "ç"}
_LANGS = ["en", "de", "fr", "es", "pl"]


def _base_text(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n_words))


def _noisy_text(rng: random.Random, text: str) -> str:
    """Apply 1-3 reference-normalizer noise classes to a duplicate's text."""
    words = text.split()
    for _ in range(rng.randint(1, 3)):
        kind = rng.randint(0, 5)
        if kind == 0 and words:  # case flip on some words
            i = rng.randrange(len(words))
            words[i] = words[i].upper() if rng.random() < 0.5 else words[i].title()
        elif kind == 1 and words:  # accent injection
            i = rng.randrange(len(words))
            words[i] = "".join(_ACCENT.get(ch, ch) for ch in words[i])
        elif kind == 2 and len(words) > 2:  # small typo: drop one char
            i = rng.randrange(len(words))
            w = words[i]
            if len(w) > 3:
                j = rng.randrange(len(w))
                words[i] = w[:j] + w[j + 1 :]
        elif kind == 3 and len(words) > 3:  # adjacent token swap
            i = rng.randrange(len(words) - 1)
            words[i], words[i + 1] = words[i + 1], words[i]
        elif kind == 4:  # run of spaces
            i = rng.randrange(max(len(words) - 1, 1))
            words[i] = words[i] + " "
        else:  # newline insertion
            i = rng.randrange(max(len(words) - 1, 1))
            words[i] = words[i] + "\n"
    s = " ".join(words)
    if rng.random() < 0.15:
        s = f'"{s}"'
    return s


def make_pages(
    n_base: int = 500,
    dup_fraction: float = 0.3,
    max_dups: int = 3,
    n_hosts: int = 40,
    seed: int = 42,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (pages, truth).

    pages: url, warc_ts, html(bytes), text, lang — duplicates share the base
    page's *exact* text bytes? No: duplicate variants perturb ``text`` with
    normalizer-recoverable noise; the byte-identity invariant is that each
    row's OWN text survives the pipeline unchanged, not that variants match.
    truth: url -> true_cluster_id (base index; singletons included).

    Host distribution is intentionally skewed (~zipf) so blocking-key skew
    handling is exercised even at test scale.
    """
    rng = random.Random(seed)
    t0 = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    rows: list[dict] = []
    truth: list[dict] = []
    for i in range(n_base):
        # zipf-ish host pick: host h with weight ~ 1/(h+1)
        r = rng.random()
        host_i = min(int(n_hosts * (r**2)), n_hosts - 1)
        host = f"site{host_i}.example.com"
        path = f"/article/{i}"
        url = f"https://{host}{path}"
        text = _base_text(rng, rng.randint(20, 60))
        lang = rng.choice(_LANGS)
        ts = t0 + dt.timedelta(minutes=i)
        rows.append(
            dict(url=url, warc_ts=ts, html=f"<html>{text}</html>".encode(), text=text, lang=lang)
        )
        truth.append(dict(url=url, true_cluster_id=i))
        if rng.random() < dup_fraction:
            for d in range(rng.randint(1, max_dups)):
                vkind = rng.randint(0, 2)
                if vkind == 0:
                    vurl = f"https://www.{host}{path}"
                elif vkind == 1:
                    vurl = f"http://{host}{path}?ref=dup{d}"
                else:
                    vurl = f"https://{host}{path}/amp{d}"
                vtext = _noisy_text(rng, text)
                rows.append(
                    dict(
                        url=vurl,
                        warc_ts=ts + dt.timedelta(seconds=d + 1),
                        html=f"<html>{vtext}</html>".encode(),
                        text=vtext,
                        lang=lang,
                    )
                )
                truth.append(dict(url=vurl, true_cluster_id=i))
    pages = pd.DataFrame(rows)
    # de-dup urls (variant urls could collide only if generator changes; keep stable)
    pages = pages.drop_duplicates(subset=["url"]).reset_index(drop=True)
    truth_df = pd.DataFrame(truth).drop_duplicates(subset=["url"]).reset_index(drop=True)
    return pages, truth_df


def make_labeled_pairs(
    truth: pd.DataFrame, n_pos: int = 200, n_neg: int = 400, seed: int = 43
) -> pd.DataFrame:
    """labeled_pairs(url1<url2, label y/n/u) from ground truth (FIXTURES.md F2).

    Positives: within-cluster pairs. Negatives: cross-cluster, biased toward
    near-misses (same host) plus random. A few 'u' rows are emitted because
    the reference generates them and requires filtering (page.tsx:253).
    """
    rng = random.Random(seed)
    by_cluster: dict[int, list[str]] = {}
    for u, c in zip(truth["url"], truth["true_cluster_id"]):
        by_cluster.setdefault(int(c), []).append(u)
    multi = [urls for urls in by_cluster.values() if len(urls) > 1]
    pos: set[tuple[str, str]] = set()
    # bounded attempts: a small corpus may not contain n_pos distinct
    # within-cluster pairs at all
    tries = 0
    while len(pos) < n_pos and multi and tries < n_pos * 50:
        tries += 1
        urls = rng.choice(multi)
        a, b = rng.sample(urls, 2)
        pos.add((min(a, b), max(a, b)))
    all_urls = list(truth["url"])
    url_cluster = dict(zip(truth["url"], truth["true_cluster_id"]))
    host = lambda u: u.split("/")[2].removeprefix("www.")
    by_host: dict[str, list[str]] = {}
    for u in all_urls:
        by_host.setdefault(host(u), []).append(u)
    neg: set[tuple[str, str]] = set()
    tries = 0
    while len(neg) < n_neg and tries < n_neg * 50:
        tries += 1
        if rng.random() < 0.5:  # near-miss: same host, different cluster
            urls = by_host[rng.choice(list(by_host))]
            if len(urls) < 2:
                continue
            a, b = rng.sample(urls, 2)
        else:
            a, b = rng.sample(all_urls, 2)
        if url_cluster[a] == url_cluster[b]:
            continue
        neg.add((min(a, b), max(a, b)))
    rows = [dict(url1=a, url2=b, label="y") for a, b in sorted(pos)]
    rows += [dict(url1=a, url2=b, label="n") for a, b in sorted(neg)]
    # a handful of 'u' (unsure) rows that training must filter out
    for a, b in list(sorted(neg))[:3]:
        rows.append(dict(url1=a, url2=b, label="u"))
    return pd.DataFrame(rows)


def make_kna_customers(n_base: int = 300, seed: int = 44) -> pd.DataFrame:
    """Reference-schema parity fixture (FIXTURES.md F3): KNA1-style customer
    master rows with seeded duplicate injection; all-string columns plus
    ``source_file`` lineage (dedupe_script.py:81,:104)."""
    rng = random.Random(seed)
    cities = ["Berlin", "Hamburg", "Munich", "Cologne", "Essen", "Dortmund"]
    streets = ["Hauptstr.", "Bahnhofstr.", "Gartenweg", "Ringstr.", "Marktplatz"]
    rows = []
    rid = 0
    for i in range(n_base):
        name = f"{rng.choice(_VOCAB).title()} {rng.choice(['GmbH','AG','KG','e.V.'])}"
        row = {
            "Customer": str(10000 + i),
            "Name 1": name,
            "Name 2": rng.choice(["", "Filiale", "Zentrale", "nan"]),
            "Street": f"{rng.choice(streets)} {rng.randint(1, 200)}",
            "Postal Code": f"{rng.randint(10000, 99999)}",
            "City": rng.choice(cities),
            "Region": rng.choice(["BE", "HH", "BY", "NW"]),
            "Country": "DE",
            "source_file": "kna_a.csv",
        }
        rows.append(row)
        rid += 1
        if rng.random() < 0.25:
            dup = dict(row)
            dup["Name 1"] = _noisy_text(rng, row["Name 1"])
            dup["Customer"] = str(90000 + i)
            dup["source_file"] = "kna_b.csv"
            rows.append(dup)
    return pd.DataFrame(rows)
