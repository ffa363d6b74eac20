"""Continuous-batching engine + server tests (CPU, tiny model).

The key behavioral contracts (VERDICT round-1 item 3 / BASELINE.json
north-star config 5):
  * engine output is identical to the monolithic Generator decode path;
  * a request submitted MID-DECODE is admitted at the next chunk boundary
    and completes without waiting for the running batch to drain;
  * finished sequences retire and free slots without stopping the batch.

The tiny random model never emits a real EOS id (vocab 512 < the EOS ids),
so every sequence runs to its token budget — decode length is exactly
``max_tokens``, which makes completion-order assertions deterministic.
"""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from qwen3_asr_tpu.api import Qwen3ASR, TranscriptionResult
from qwen3_asr_tpu.config import RuntimeConfig
from qwen3_asr_tpu.serving.server import ContinuousTranscriptionServer
from tests.test_api import TINY_CFG, StubTokenizer, sine

RT_ENGINE = RuntimeConfig(
    frame_buckets=(800, 1600, 3200), token_buckets=(128, 256)
)


@pytest.fixture(scope="module")
def model():
    return Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=RT_ENGINE, dtype=jnp.float32
    )


def test_engine_matches_direct(model):
    """Greedy engine output == the monolithic decode path's output."""
    clips = [sine(1.0, 440.0), sine(2.0, 330.0), sine(0.5, 550.0)]
    direct = [model.transcribe(c, max_tokens=6) for c in clips]

    engine = model.make_engine(n_slots=4, max_duration=8.0, max_new_tokens=128)
    from qwen3_asr_tpu.runtime.engine import SlotRequest

    kv, logits, prompts = model.prefill_group(
        clips, ["English"] * len(clips)
    )
    reqs = [
        SlotRequest(samples=c, prompt=p, max_new=6, meta=i)
        for i, (c, p) in enumerate(zip(clips, prompts))
    ]
    engine.admit(kv, logits, engine.free_slots(), reqs)
    results = {}
    for _ in range(50):
        if engine.n_active() == 0 and not results:
            pass
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == len(clips):
            break
    assert len(results) == len(clips)
    for i, r in enumerate(direct):
        text = model._finalize_output(results[i], "English")[0]
        assert text == r.text, f"clip {i}: engine != direct"


def test_engine_heterogeneous_depths(model):
    """Sequences admitted at different times decode correctly together."""
    from qwen3_asr_tpu.runtime.engine import SlotRequest

    clip_a, clip_b = sine(1.0, 440.0), sine(1.5, 260.0)
    direct_a = model.transcribe(clip_a, max_tokens=12)
    direct_b = model.transcribe(clip_b, max_tokens=5)

    engine = model.make_engine(
        n_slots=4, max_duration=8.0, max_new_tokens=128, chunk_steps=4
    )
    kv, logits, prompts = model.prefill_group([clip_a], ["English"])
    engine.admit(
        kv, logits, engine.free_slots(),
        [SlotRequest(samples=clip_a, prompt=prompts[0], max_new=12, meta="a")],
    )
    engine.step()  # a is now 4+1 tokens deep
    assert engine.n_active() == 1

    kv, logits, prompts = model.prefill_group([clip_b], ["English"])
    engine.admit(
        kv, logits, engine.free_slots(),
        [SlotRequest(samples=clip_b, prompt=prompts[0], max_new=5, meta="b")],
    )
    assert engine.stats.mid_decode_admissions == 1

    results = {}
    for _ in range(20):
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == 2:
            break
    assert model._finalize_output(results["a"], "English")[0] == direct_a.text
    assert model._finalize_output(results["b"], "English")[0] == direct_b.text


def test_continuous_server_mid_decode_admission(model):
    """A short request submitted mid-decode finishes BEFORE the long
    running request — the round-1 server would block it until the batch
    drained."""
    long_clip, short_clip = sine(2.0, 440.0), sine(0.5, 330.0)
    direct_short = model.transcribe(short_clip, max_tokens=4)

    with ContinuousTranscriptionServer(
        model, n_slots=4, max_duration=8.0, max_new_tokens=128, chunk_steps=4
    ) as srv:
        f_long = srv.submit(long_clip, max_tokens=100)
        # Wait until the long request is actually decoding.
        deadline = time.time() + 60
        while srv.engine_stats.admitted < 1 and time.time() < deadline:
            time.sleep(0.01)
        f_short = srv.submit(short_clip, max_tokens=4)
        short_res = f_short.result(timeout=120)
        assert not f_long.done(), (
            "short request should complete while the long decode is running"
        )
        long_res = f_long.result(timeout=120)

    assert short_res.text == direct_short.text
    assert long_res.text
    assert srv.engine_stats.mid_decode_admissions >= 1


def test_continuous_server_matches_direct(model):
    clips = [sine(0.7, 300.0 + 40 * i) for i in range(5)]
    direct = [model.transcribe(c, max_tokens=5) for c in clips]
    with ContinuousTranscriptionServer(
        model, n_slots=2, max_duration=8.0, max_new_tokens=128, chunk_steps=8
    ) as srv:
        futs = [srv.submit(c, max_tokens=5) for c in clips]
        results = [f.result(timeout=300) for f in futs]
    assert [r.text for r in results] == [d.text for d in direct]
    # 5 requests through 2 slots: retirement must have freed slots.
    assert srv.engine_stats.retired == 5


def test_continuous_server_rejects_long_clip(model):
    with ContinuousTranscriptionServer(
        model, n_slots=2, max_duration=4.0, max_new_tokens=128
    ) as srv:
        fut = srv.submit(sine(6.0), max_tokens=4)
        with pytest.raises(ValueError, match="max_duration"):
            fut.result(timeout=60)


def test_continuous_server_empty_clip(model):
    with ContinuousTranscriptionServer(
        model, n_slots=2, max_duration=4.0, max_new_tokens=128
    ) as srv:
        res = srv.submit(np.zeros(0, np.float32)).result(timeout=60)
    assert res == TranscriptionResult(text="", language="Unknown", duration=0.0)


# -- paged KV cache mode ------------------------------------------------------


def test_paged_engine_matches_direct(model):
    """Paged-cache greedy output == the monolithic decode path's output."""
    from qwen3_asr_tpu.runtime.engine import SlotRequest

    clips = [sine(1.0, 440.0), sine(2.0, 330.0), sine(0.5, 550.0)]
    direct = [model.transcribe(c, max_tokens=6) for c in clips]

    engine = model.make_engine(
        n_slots=4, max_duration=8.0, max_new_tokens=128, paged=True
    )
    assert engine.paged
    kv, logits, prompts = model.prefill_group(clips, ["English"] * len(clips))
    reqs = [
        SlotRequest(samples=c, prompt=p, max_new=6, meta=i)
        for i, (c, p) in enumerate(zip(clips, prompts))
    ]
    rejected = engine.admit(kv, logits, engine.free_slots(), reqs)
    assert rejected == []
    results = {}
    for _ in range(50):
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == len(clips):
            break
    for i, r in enumerate(direct):
        text = model._finalize_output(results[i], "English")[0]
        assert text == r.text, f"clip {i}: paged engine != direct"
    # All pages must return to the pool after retirement.
    assert len(engine._free_pages) == engine.n_pages - 1


def test_paged_engine_oversubscribed_pool(model):
    """A pool too small for all slots at once: requests pause/defer but
    every one completes correctly (pages recycle through retirement)."""
    from qwen3_asr_tpu.runtime.engine import DecodeEngine, SlotRequest

    clips = [sine(1.0, 300.0 + 30 * i) for i in range(4)]
    direct = [model.transcribe(c, max_tokens=6) for c in clips]

    gen = model._generator
    # 3 pages + trash: each request needs 1 prompt page (prompt ~130 ids
    # with 256-row pages) + 1 decode page -> at most one seq fully
    # resident; admissions must defer.
    engine = DecodeEngine(
        gen, prompt_bucket=256, token_bucket=128, n_slots=4,
        chunk_steps=8, paged=True, page_size=256, n_pages=4,
    )
    pending = list(range(len(clips)))
    results = {}
    deferred: list[SlotRequest] = []
    for _ in range(200):
        if pending or deferred:
            reqs = deferred
            deferred = []
            if pending:
                i = pending.pop(0)
                kv, logits, prompts = model.prefill_group(
                    [clips[i]], ["English"]
                )
                reqs = reqs + [
                    SlotRequest(
                        samples=clips[i], prompt=prompts[0], max_new=6, meta=i
                    )
                ]
            if reqs:
                kv2, lg2, pr2 = model.prefill_group(
                    [r.samples for r in reqs], ["English"] * len(reqs)
                )
                deferred = engine.admit(kv2, lg2, engine.free_slots(), reqs)
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == len(clips) and not pending and not deferred:
            break
    assert len(results) == len(clips)
    for i, r in enumerate(direct):
        text = model._finalize_output(results[i], "English")[0]
        assert text == r.text, f"clip {i}: oversubscribed paged != direct"


def test_paged_engine_spec_oversubscribed_pool(model, monkeypatch):
    """Spec verify chunks under pool pressure: planning k_steps x
    (gamma+1) decode pages makes pausing MORE aggressive, but every
    request still completes with the plain-path tokens (pages recycle
    through retirement; tentative overflow rows land on trash page 0)."""
    from qwen3_asr_tpu.runtime.engine import DecodeEngine, SlotRequest

    monkeypatch.setattr(model._generator.runtime, "spec_engine", "on")
    clips = [sine(1.0, 300.0 + 30 * i) for i in range(4)]
    monkeypatch.setattr(model._generator.runtime, "spec_engine", "off")
    direct = [model.transcribe(c, max_tokens=6) for c in clips]
    monkeypatch.setattr(model._generator.runtime, "spec_engine", "on")

    gen = model._generator
    engine = DecodeEngine(
        gen, prompt_bucket=256, token_bucket=128, n_slots=4,
        chunk_steps=8, paged=True, page_size=256, n_pages=4,
    )
    pending = list(range(len(clips)))
    results = {}
    deferred: list[SlotRequest] = []
    for _ in range(200):
        if pending or deferred:
            reqs = deferred
            deferred = []
            if pending:
                i = pending.pop(0)
                kv, logits, prompts = model.prefill_group(
                    [clips[i]], ["English"]
                )
                reqs = reqs + [
                    SlotRequest(
                        samples=clips[i], prompt=prompts[0], max_new=6, meta=i
                    )
                ]
            if reqs:
                kv2, lg2, pr2 = model.prefill_group(
                    [r.samples for r in reqs], ["English"] * len(reqs)
                )
                deferred = engine.admit(kv2, lg2, engine.free_slots(), reqs)
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == len(clips) and not pending and not deferred:
            break
    assert len(results) == len(clips)
    assert engine.stats.spec_chunks > 0
    for i, r in enumerate(direct):
        text = model._finalize_output(results[i], "English")[0]
        assert text == r.text, f"clip {i}: spec oversubscribed != direct"


def test_paged_continuous_server_mid_decode(model):
    direct_short = model.transcribe(sine(0.5, 330.0), max_tokens=4)
    with ContinuousTranscriptionServer(
        model, n_slots=4, max_duration=8.0, max_new_tokens=128,
        chunk_steps=4, paged=True,
    ) as srv:
        f_long = srv.submit(sine(2.0, 440.0), max_tokens=100)
        deadline = time.time() + 60
        while srv.engine_stats.admitted < 1 and time.time() < deadline:
            time.sleep(0.01)
        f_short = srv.submit(sine(0.5, 330.0), max_tokens=4)
        short_res = f_short.result(timeout=120)
        assert not f_long.done()
        long_res = f_long.result(timeout=120)
    assert short_res.text == direct_short.text
    assert long_res.text


def test_prefill_group_batch_bucketing(model):
    """Group batch dims are padded to power-of-two buckets and sliced back:
    a 3-clip group runs the same compiled prefill as a 4-clip group, and
    padding rows never leak into the results."""
    clips = [sine(1.0, 440.0), sine(1.0, 330.0), sine(1.0, 550.0)]
    kv3, lg3, pr3 = model.prefill_group(clips, ["English"] * 3)
    assert lg3.shape[0] == 3
    assert kv3[0].shape[1] == 3
    assert len(pr3) == 3
    kv1, lg1, _ = model.prefill_group([clips[0]], ["English"])
    np.testing.assert_allclose(
        np.asarray(lg3[0]), np.asarray(lg1[0]), rtol=1e-4, atol=1e-4
    )


def test_continuous_server_warm(model):
    """warm=True pre-compiles every admission-group size before serving."""
    with ContinuousTranscriptionServer(
        model, n_slots=2, max_duration=4.0, max_new_tokens=64,
        chunk_steps=4, warm=True,
    ) as srv:
        res = srv.transcribe(sine(0.5, 440.0), max_tokens=4)
    assert res.text


def test_paged_compaction_and_width_bucketing(model):
    """Retirement compacts live slots into a prefix (paged mode), and the
    narrowed decode continues token-identically."""
    clips = [sine(1.0, 440.0), sine(2.0, 330.0), sine(0.5, 550.0)]
    budgets = [6, 2, 6]  # middle slot retires first (no EOS in tiny vocab)
    direct = [
        model.transcribe(c, max_tokens=b) for c, b in zip(clips, budgets)
    ]

    from qwen3_asr_tpu.runtime.engine import SlotRequest

    engine = model.make_engine(
        n_slots=4, max_duration=8.0, max_new_tokens=128, chunk_steps=2,
        paged=True,
    )
    kv, logits, prompts = model.prefill_group(clips, ["English"] * 3)
    reqs = [
        SlotRequest(samples=c, prompt=p, max_new=b, meta=i)
        for i, (c, p, b) in enumerate(zip(clips, prompts, budgets))
    ]
    engine.admit(kv, logits, engine.free_slots(), reqs)
    results = {}
    compacted = False
    for _ in range(30):
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if 1 in results and engine.n_active() == 2:
            # middle slot retired while 0 and 2 still decode: live slots
            # must form a prefix (slot 2's state moved down to slot 1)
            assert list(engine._live) == [True, True, False, False]
            compacted = True
        if len(results) == 3:
            break
    assert compacted, "compaction never observed"
    assert len(results) == 3
    for i, d in enumerate(direct):
        text = model._finalize_output(results[i], "English")[0]
        assert text == d.text, f"clip {i} diverged after compaction"


def test_engine_chunk_program_while_matches_scan(model):
    """The "while" chunk opt-out (QWEN3_ASR_ENGINE_CHUNK=while) is
    token-identical to the canonical fixed-length "scan" chunk for greedy
    slots — early exit vs trailing no-op iterations must not change any
    harvested token."""
    from qwen3_asr_tpu.runtime.engine import SlotRequest

    clips = [sine(1.0, 440.0), sine(0.5, 550.0)]

    def run(chunk_program):
        engine = model.make_engine(
            n_slots=4, max_duration=8.0, max_new_tokens=128, chunk_steps=4,
            chunk_program=chunk_program,
        )
        assert engine.chunk_program == chunk_program
        kv, logits, prompts = model.prefill_group(clips, ["English"] * 2)
        reqs = [
            SlotRequest(samples=c, prompt=p, max_new=6, meta=i)
            for i, (c, p) in enumerate(zip(clips, prompts))
        ]
        engine.admit(kv, logits, engine.free_slots(), reqs)
        results = {}
        for _ in range(50):
            engine.step()
            for req, toks in engine.retire():
                results[req.meta] = toks
            if len(results) == len(clips):
                break
        return results

    scan_r, while_r = run("scan"), run("while")
    assert scan_r.keys() == while_r.keys()
    for k in scan_r:
        assert scan_r[k] == while_r[k], f"clip {k}: while != scan"


def test_engine_chunk_program_validation(model):
    with pytest.raises(ValueError, match="chunk_program"):
        model.make_engine(
            n_slots=2, max_duration=4.0, max_new_tokens=64,
            chunk_program="bogus",
        )


def test_engine_with_int8_quantized_decoder():
    """Continuous engine over int8 weights == direct quantized decode."""
    rt = RuntimeConfig(
        frame_buckets=(800,), token_buckets=(16, 128), quantization="int8"
    )
    m = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt, dtype=jnp.float32
    )
    clip = sine(1.0, 440.0)
    direct = m.transcribe(clip, max_tokens=5)
    with ContinuousTranscriptionServer(
        m, n_slots=2, max_duration=4.0, max_new_tokens=64, chunk_steps=4,
    ) as srv:
        res = srv.transcribe(clip, max_tokens=5)
    assert res.text == direct.text


def test_engine_spec_chunks_match_plain(model, monkeypatch):
    """Speculative verify chunks (spec_engine="on") harvest exactly the
    plain chunks' tokens — the engine-level mirror of the Generator's
    spec-vs-greedy identity (tests/test_speculative.py) — and the
    acceptance counters move."""
    from qwen3_asr_tpu.runtime.engine import SlotRequest

    clips = [sine(1.0, 440.0), sine(2.0, 330.0), sine(0.5, 550.0)]

    def run(mode):
        monkeypatch.setattr(model._generator.runtime, "spec_engine", mode)
        engine = model.make_engine(
            n_slots=4, max_duration=8.0, max_new_tokens=128, chunk_steps=4
        )
        kv, logits, prompts = model.prefill_group(clips, ["English"] * 3)
        reqs = [
            SlotRequest(samples=c, prompt=p, max_new=9, meta=i)
            for i, (c, p) in enumerate(zip(clips, prompts))
        ]
        engine.admit(kv, logits, engine.free_slots(), reqs)
        results = {}
        for _ in range(50):
            engine.step()
            for req, toks in engine.retire():
                results[req.meta] = toks
            if len(results) == len(clips):
                break
        return results, engine.stats

    spec_r, spec_stats = run("on")
    plain_r, plain_stats = run("off")
    assert spec_stats.spec_chunks > 0 and plain_stats.spec_chunks == 0
    # Device-side forward counter: every lane pays >= 1 forward per
    # emitted token at worst, <= gamma+1 accepted per forward at best —
    # and the looping tiny model accepts SOME drafts, so the honest
    # ratio sits strictly above 1 (the old chunk-padded denominator
    # diluted this to ~tokens/(k * chunks)).
    rt = model._generator.runtime
    assert 1.0 < spec_stats.spec_tokens_per_forward <= rt.spec_gamma + 1
    assert spec_r.keys() == plain_r.keys()
    for k in spec_r:
        assert spec_r[k] == plain_r[k], f"clip {k}: spec != plain"


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_paged_engine_spec_chunks_match_plain(model, monkeypatch, kv_dtype):
    """Paged spec verify chunks harvest exactly the plain paged chunks'
    tokens — for bf16 AND int8 page pools (the per-row paged writer
    re-quantizes tentative rows)."""
    from qwen3_asr_tpu.runtime.engine import SlotRequest

    if kv_dtype == "int8":
        monkeypatch.setattr(
            model._generator.runtime, "kv_cache_dtype", "int8"
        )
    clips = [sine(1.0, 440.0), sine(2.0, 330.0), sine(0.5, 550.0)]

    def run(mode):
        monkeypatch.setattr(model._generator.runtime, "spec_engine", mode)
        engine = model.make_engine(
            n_slots=4, max_duration=8.0, max_new_tokens=128, chunk_steps=4,
            paged=True, page_size=256,
        )
        kv, logits, prompts = model.prefill_group(clips, ["English"] * 3)
        reqs = [
            SlotRequest(samples=c, prompt=p, max_new=9, meta=i)
            for i, (c, p) in enumerate(zip(clips, prompts))
        ]
        engine.admit(kv, logits, engine.free_slots(), reqs)
        results = {}
        for _ in range(50):
            engine.step()
            for req, toks in engine.retire():
                results[req.meta] = toks
            if len(results) == len(clips):
                break
        return results, engine.stats

    spec_r, spec_stats = run("on")
    plain_r, plain_stats = run("off")
    assert spec_stats.spec_chunks > 0 and plain_stats.spec_chunks == 0
    assert spec_r.keys() == plain_r.keys()
    for k in spec_r:
        assert spec_r[k] == plain_r[k], f"clip {k}: paged spec != plain"


def test_paged_spec_tentative_rows_at_full_table(model, monkeypatch):
    """Regression: with the page table exactly full (budget ending on a
    page boundary: prompt_bucket=token_bucket=page_size, maxp=2),
    tentative verify rows past the last page must land on the trash
    page — clipping their page index redirected them onto the slot's
    last REAL page, overwriting accepted decode history at wrow % PS
    and diverging from plain greedy.  Garbage always-"valid" drafts
    force rejections so the lane keeps attending the rows the overflow
    writes would have corrupted."""
    import qwen3_asr_tpu.ops.speculative as spec_mod
    from qwen3_asr_tpu.runtime.engine import DecodeEngine, SlotRequest

    real_draft = spec_mod.ngram_draft

    def garbage_draft(tokens, counts, n=2, gamma=3):
        d, v = real_draft(tokens, counts, n=n, gamma=gamma)
        return jnp.full_like(d, 499), jnp.ones_like(v)

    clip = sine(1.0, 440.0)

    def run(mode, draft_fn):
        monkeypatch.setattr(spec_mod, "ngram_draft", draft_fn)
        monkeypatch.setattr(model._generator.runtime, "spec_engine", mode)
        engine = DecodeEngine(
            model._generator, prompt_bucket=256, token_bucket=256,
            n_slots=2, chunk_steps=8, paged=True, page_size=256,
        )
        kv, logits, prompts = model.prefill_group([clip], ["English"])
        slot = engine.free_slots()[0]
        engine.admit(
            kv, logits, [slot],
            [SlotRequest(samples=clip, prompt=prompts[0], max_new=256,
                         meta=0)],
        )
        # Run until well past decode row 0's one legitimate write but
        # before the page-boundary chunks, snapshot that row, then run
        # to completion: ONLY overflow writes could touch it again.
        snap = None
        dp_page = None
        toks = None
        for _ in range(80):
            engine.step()
            if snap is None and engine._counts[slot] >= 100:
                dp_page = int(engine._page_table[slot, 1])
                assert dp_page != 0
                snap = np.asarray(
                    engine._keys[:, dp_page, :, 0, :], np.float32
                )
            got = engine.retire()
            if got:
                toks = got[0][1]
                break
        assert toks is not None, "request did not finish"
        assert snap is not None, "never reached the snapshot depth"
        after = np.asarray(engine._keys[:, dp_page, :, 0, :], np.float32)
        return toks, snap, after

    plain, _, _ = run("off", real_draft)
    spec, snap, after = run("on", garbage_draft)
    assert len(plain) > 200  # the budget actually reached the boundary
    # The physical invariant: overflow tentative rows never landed on
    # the slot's real decode page (the old clip rewrote row 0 of the
    # table's last entry with draft-token K/V).
    np.testing.assert_array_equal(snap, after)
    assert spec == plain


def test_paged_spec_downgrades_when_pool_tight(model, monkeypatch):
    """Spec-sized page planning (k x (gamma+1) rows up-front) that would
    strand EVERY slot must downgrade the chunk to plain-sized planning.
    Scenario: one free decode page, two admitted slots each spec-planning
    2 pages — the first slot's partial grab (1 of 2) plus the second's
    empty grab left nothing runnable, so the old code force-finished the
    deepest slot at ~1 token.  Plain-sized planning runs a full 128-row
    chunk on the single page instead."""
    from qwen3_asr_tpu.runtime.engine import DecodeEngine, SlotRequest

    monkeypatch.setattr(model._generator.runtime, "spec_engine", "on")
    clips = [sine(1.0, 440.0), sine(0.7, 330.0)]
    engine = DecodeEngine(
        model._generator, prompt_bucket=256, token_bucket=256,
        n_slots=2, chunk_steps=128, paged=True, page_size=128,
        n_pages=6,   # trash + 2x2 prompt pages + ONE decode page
    )
    kv, logits, prompts = model.prefill_group(clips, ["English"] * 2)
    engine.admit(
        kv, logits, engine.free_slots(),
        [
            SlotRequest(samples=c, prompt=p, max_new=256, meta=i)
            for i, (c, p) in enumerate(zip(clips, prompts))
        ],
    )
    results = {}
    for _ in range(60):
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == 2:
            break
    assert len(results) == 2
    # The pool cannot hold both requests' full budgets, so the deepest
    # slot is eventually force-finished — but only AFTER plain-sized
    # chunks let it emit a full page of tokens (the old spec-sized
    # planning truncated it at ~1 token before any progress).
    assert max(len(t) for t in results.values()) >= 128
    assert min(len(t) for t in results.values()) >= 128


def test_paged_engine_spec_width_bucketing(model, monkeypatch):
    """Spec verify chunks compose with paged width bucketing: after
    retirement compacts to a narrow prefix, the narrow spec program
    still harvests the plain tokens."""
    from qwen3_asr_tpu.runtime.engine import SlotRequest

    monkeypatch.setattr(model._generator.runtime, "spec_engine", "off")
    clip_a, clip_b = sine(1.5, 440.0), sine(0.7, 260.0)
    direct_a = model.transcribe(clip_a, max_tokens=24)
    direct_b = model.transcribe(clip_b, max_tokens=8)

    monkeypatch.setattr(model._generator.runtime, "spec_engine", "on")
    engine = model.make_engine(
        n_slots=4, max_duration=8.0, max_new_tokens=128, chunk_steps=2,
        paged=True, page_size=256,
    )
    kv, logits, prompts = model.prefill_group(
        [clip_a, clip_b], ["English"] * 2
    )
    engine.admit(
        kv, logits, engine.free_slots()[:2],
        [
            SlotRequest(samples=clip_a, prompt=prompts[0], max_new=24, meta="a"),
            SlotRequest(samples=clip_b, prompt=prompts[1], max_new=8, meta="b"),
        ],
    )
    results = {}
    for _ in range(60):
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == 2:
            break
    assert engine.stats.spec_chunks > 0
    assert model._finalize_output(results["a"], "English")[0] == direct_a.text
    assert model._finalize_output(results["b"], "English")[0] == direct_b.text


def test_engine_spec_mid_decode_admission(model, monkeypatch):
    """Spec chunks + heterogeneous depths: a request admitted while
    another slot is mid-decode still harvests the plain-path tokens."""
    from qwen3_asr_tpu.runtime.engine import SlotRequest

    monkeypatch.setattr(model._generator.runtime, "spec_engine", "off")
    clip_a, clip_b = sine(1.5, 440.0), sine(0.7, 260.0)
    direct_a = model.transcribe(clip_a, max_tokens=24)
    direct_b = model.transcribe(clip_b, max_tokens=8)

    monkeypatch.setattr(model._generator.runtime, "spec_engine", "on")
    engine = model.make_engine(
        n_slots=4, max_duration=8.0, max_new_tokens=128, chunk_steps=1
    )
    kv, logits, prompts = model.prefill_group([clip_a], ["English"])
    engine.admit(
        kv, logits, engine.free_slots(),
        [SlotRequest(samples=clip_a, prompt=prompts[0], max_new=24, meta="a")],
    )
    engine.step()  # one verify chunk: a is 2..5 tokens deep
    assert engine.n_active() == 1

    kv, logits, prompts = model.prefill_group([clip_b], ["English"])
    engine.admit(
        kv, logits, engine.free_slots(),
        [SlotRequest(samples=clip_b, prompt=prompts[0], max_new=8, meta="b")],
    )
    assert engine.stats.mid_decode_admissions == 1

    results = {}
    for _ in range(60):
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == 2:
            break
    assert model._finalize_output(results["a"], "English")[0] == direct_a.text
    assert model._finalize_output(results["b"], "English")[0] == direct_b.text


def test_engine_spec_gating(model, monkeypatch):
    """spec_engine="auto" plans spec only for all-greedy chunks on narrow
    flat bf16-KV engines; paged / int8-KV / wide / mixed chunks stay on
    the plain body."""
    rt = model._generator.runtime
    monkeypatch.setattr(rt, "spec_engine", "auto")
    eng = model.make_engine(n_slots=4, max_duration=4.0, max_new_tokens=64)
    assert eng._plan_chunk_spec(True) == (rt.spec_gamma, rt.spec_ngram)
    assert eng._plan_chunk_spec(False) is None          # sampled lanes
    monkeypatch.setattr(rt, "spec_engine_max_slots", 2)
    assert eng._plan_chunk_spec(True) is None           # too wide for auto
    monkeypatch.setattr(rt, "spec_engine", "on")
    assert eng._plan_chunk_spec(True) == (rt.spec_gamma, rt.spec_ngram)
    monkeypatch.setattr(rt, "spec_engine", "off")
    assert eng._plan_chunk_spec(True) is None

    paged = model.make_engine(
        n_slots=4, max_duration=4.0, max_new_tokens=64, paged=True
    )
    monkeypatch.setattr(rt, "spec_engine", "on")
    assert paged._plan_chunk_spec(True) == (rt.spec_gamma, rt.spec_ngram)
    monkeypatch.setattr(rt, "spec_gamma", 9)            # QPAD overflow
    assert paged._plan_chunk_spec(True) is None
    monkeypatch.setattr(rt, "spec_gamma", 3)
    # Paged "auto" uses its own (higher) width ceiling: the verify
    # kernel rides the sublane pad, so widths the flat XLA verify
    # declines stay profitable (measured 1.90x at n_slots=16).
    monkeypatch.setattr(rt, "spec_engine", "auto")
    paged16 = model.make_engine(
        n_slots=16, max_duration=4.0, max_new_tokens=64, paged=True
    )
    assert paged16._plan_chunk_spec(True) == (rt.spec_gamma, rt.spec_ngram)
    monkeypatch.setattr(rt, "spec_engine_max_slots_paged", 8)
    assert paged16._plan_chunk_spec(True) is None

    monkeypatch.setattr(rt, "kv_cache_dtype", "int8")
    eng8 = model.make_engine(n_slots=4, max_duration=4.0, max_new_tokens=64)
    assert eng8._plan_chunk_spec(True) is None          # no flat int8 verify
    paged8 = model.make_engine(
        n_slots=4, max_duration=4.0, max_new_tokens=64, paged=True
    )
    assert paged8._plan_chunk_spec(True) == (rt.spec_gamma, rt.spec_ngram)
