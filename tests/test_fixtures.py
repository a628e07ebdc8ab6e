"""Self-consistency of the pure-Python reference fixtures (no Spark)."""

from web_scraper_v1_spark import fixtures as fx


def test_parser_transliteration_matches_go_semantics():
    # well-formed body (receiver template, cmd/receiver/main.go:30)
    body = "Received User-Agent: UA1\nIP Address: 1.2.3.4\nForwarded Host: h"
    assert fx.parse_receiver_response(body) == ("UA1", "1.2.3.4", "h")
    # <3 lines -> error (receiver_response_parser.go:20-22)
    assert fx.parse_receiver_response("a\nb") is None
    assert fx.parse_receiver_response("one line") is None
    # 3+ lines but no prefixes -> zero-value fields
    assert fx.parse_receiver_response("a\nb\nc") == ("", "", "")
    # last match wins (Go loop order, parser.go:26-34)
    body = (
        "Received User-Agent: first\nReceived User-Agent: second\n"
        "IP Address: 9.9.9.9"
    )
    assert fx.parse_receiver_response(body) == ("second", "9.9.9.9", "")
    # prefix requires the trailing space byte
    assert fx.parse_receiver_response("Received User-Agent:x\nb\nc") == ("", "", "")


def test_ua_template_preserves_cyrillic_lookalikes():
    ua = fx.chrome_user_agent("https://host0.example.com/page/1")
    # chrome.go:73 spells Mozilla with Cyrillic U+043E / U+0430
    assert ua.startswith("Mоzillа/5.0 (")
    assert "о" in ua and "а" in ua
    assert ua == fx.chrome_user_agent("https://host0.example.com/page/1")


def test_corpus_determinism_and_malformed_rate():
    pages = fx.generate_pages(1000, 10)
    again = fx.generate_pages(1000, 10)
    assert pages == again
    malformed = [p for p in pages if p["text"] is None]
    assert 20 <= len(malformed) <= 90  # ~5%
    # golden text parses back to itself
    for p in pages[:50]:
        parsed = fx.parse_receiver_response(p["html"].decode("utf-8"))
        if p["text"] is None:
            assert parsed is None
        else:
            assert "\n".join(parsed) == p["text"]
    # host skew: host0 owns ~30%
    h0 = sum(1 for p in pages if fx.host_of(p["url"]) == "host0.example.com")
    assert 200 <= h0 <= 400


def test_canonicalize_url():
    cases = {
        "HTTPS://Host0.Example.COM:443/page/1": "https://host0.example.com/page/1",
        "http://a.com:80/x?q=1": "http://a.com/x?q=1",
        "http://a.com:8080/x": "http://a.com:8080/x",
        "https://a.com": "https://a.com/",
        "https://a.com/x#frag": "https://a.com/x",
        "https://a.com/x?": "https://a.com/x",
        "  https://a.com/x ": "https://a.com/x",
        "not a url": "not a url",
        "https://user@a.com/x": "https://user@a.com/x",
    }
    for raw, want in cases.items():
        assert fx.canonicalize_url(raw) == want, raw
    assert fx.host_of("https://user@Host3.com:444/p") == "host3.com"
    assert fx.path_of("https://a.com") == "/"


def test_simulator_reference_defaults():
    """11 tasks, batch 3, retry 3 — the transmitter constants
    (cmd/transmitter/main.go:176-177,160)."""
    pages = fx.generate_pages(100, 5)
    by_url = {p["url"]: p for p in pages}
    ok_urls = [p["url"] for p in pages if p["text"] is not None]
    bad_url = "https://host0.example.com/missing/1"
    seeds = [
        {"task_id": f"task-{i}", "url": u, "priority": 0, "depth": 0}
        for i, u in enumerate(
            [ok_urls[0], ok_urls[1], bad_url,          # batch 0
             ok_urls[2], ok_urls[0], ok_urls[3],       # batch 1 (dup of 0)
             ok_urls[4], ok_urls[5], ok_urls[6],       # batch 2
             ok_urls[7], ok_urls[8]],                  # batch 3 (partial)
            start=1,
        )
    ]
    sim = fx.simulate_crawl(seeds, pages, batch_size=3, retry_limit=3)
    # dup skipped entirely
    assert sim.dup_skipped == 1
    # bad url: 3 attempts (failed, failed, dropped)
    bad_rows = [t for t in sim.trace if t["url"] == bad_url]
    assert [t["outcome"] for t in bad_rows] == ["failed", "failed", "dropped"]
    assert [t["attempt"] for t in bad_rows] == [1, 2, 3]
    # seq strictly sequential from 0
    assert [t["seq"] for t in sim.trace] == list(range(len(sim.trace)))
    # identity epoch == round (rotation per batch, main.go:180-182)
    assert all(t["identity_epoch"] == t["round"] for t in sim.trace)
    assert sim.rounds == 4
    # seen set == distinct fetched urls; equals the no-dedup reference run's
    # membership (north rule: same final URL-seen set)
    ref = fx.simulate_crawl(seeds, pages, batch_size=3, retry_limit=3, dedup=False)
    assert sim.seen_urls == ref.seen_urls
    assert len(sim.seen_urls) == 9
    assert by_url  # silence lint


def test_simulator_politeness_defers_to_next_round():
    pages = [
        {"url": f"https://hosta.com/p/{i}", "text": "x"} for i in range(6)
    ]
    seeds = [
        {"task_id": f"t{i}", "url": p["url"], "priority": 0, "depth": 0}
        for i, p in enumerate(pages)
    ]
    sim = fx.simulate_crawl(seeds, pages, batch_size=6, retry_limit=3, host_budget=2)
    rounds = [t["round"] for t in sim.trace]
    assert rounds == [0, 0, 1, 1, 2, 2]
    # order preserved across deferrals
    assert [t["url"] for t in sim.trace] == [p["url"] for p in pages]


def test_simulator_robots_blocking():
    pages = fx.generate_pages(1000, 10)
    robots = fx.generate_robots(10)
    seeds = [
        {"task_id": "t1", "url": "https://host1.example.com/page/9", "priority": 0, "depth": 0},
    ]
    # even though the page may not exist, robots blocks before fetch
    sim = fx.simulate_crawl(seeds, pages, robots=robots)
    assert [t["outcome"] for t in sim.trace] == ["robots_blocked"]
