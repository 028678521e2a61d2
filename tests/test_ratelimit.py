"""Token-bucket politeness tests (ST4) with an injected clock."""

from webscrape_neko_jirushi_ray.state.ratelimit import HostRateLimiter, TokenBucket


def test_token_bucket_basic():
    b = TokenBucket(rate=1.0, burst=2.0)
    assert b.take(now=0.0) == 0.0   # burst
    assert b.take(now=0.0) == 0.0   # burst
    w = b.take(now=0.0)
    assert w == 1.0                  # empty: wait 1/rate
    # after refill time passes, immediate again
    b2 = TokenBucket(rate=2.0, burst=1.0)
    assert b2.take(now=0.0) == 0.0
    assert b2.take(now=1.0) == 0.0   # 2 tokens refilled, capped at burst 1


def test_token_bucket_rate_enforced_over_time():
    b = TokenBucket(rate=0.5, burst=1.0)
    issued = 0
    t = 0.0
    for _ in range(20):
        w = b.take(now=t)
        t += max(w, 0.0)
        if w == 0.0:
            issued += 1
        else:
            issued += 1  # after waiting w it would be issued at t
    # 20 requests at 0.5 rps from a 1-token burst need >= 38 s
    assert t >= (20 - 1) / 0.5 - 1.0


def test_host_rate_limiter_per_host_independent():
    rl = HostRateLimiter(rate=1.0, burst=1.0)
    assert rl.wait_time("a.com", now=0.0) == 0.0
    assert rl.wait_time("b.com", now=0.0) == 0.0   # separate bucket
    assert rl.wait_time("a.com", now=0.0) == 1.0   # a.com exhausted


def test_defer_pushes_host_into_debt():
    from webscrape_neko_jirushi_ray.state.ratelimit import HostRateLimiter

    lim = HostRateLimiter(rate=1.0, burst=2.0)
    assert lim.wait_time("a.example", now=0.0) == 0.0
    lim.defer("a.example", 10.0, now=0.0)
    # next claim must wait >= the deferred window (plus its own token)
    assert lim.wait_time("a.example", now=0.0) >= 10.0
    # other hosts unaffected
    assert lim.wait_time("b.example", now=0.0) == 0.0
    # a shallower defer never shrinks a deeper debt
    lim.defer("a.example", 1.0, now=0.0)
    assert lim.wait_time("a.example", now=0.0) >= 10.0
    # an unseen host gets a bucket lazily
    lim.defer("c.example", 5.0, now=0.0)
    assert lim.wait_time("c.example", now=0.0) >= 5.0
