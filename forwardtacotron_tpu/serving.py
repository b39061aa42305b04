"""Production serving: dynamic-batching TTS server (beyond the
reference, which only offers per-utterance CLI generation).

`TTSServer` owns the loaded models and a background batcher thread:
requests submitted concurrently are collected for up to `max_wait_ms`
(or until `max_batch`), then the whole group runs through ONE batched
device program per stage — token bucket -> fused series prediction ->
shared mel bucket decode -> batched vocoding (lane-packed WaveRNN
`vocode_batch`, batched HiFi-GAN, or per-item Griffin-Lim). Per-request
`alpha` / `pitch_scale` / `energy_scale` are applied host-side to the
shared series pass (alpha divides durations — the model applies it the
same way, forward_tacotron.py:270-284 analog), so heterogeneous
requests batch together.

Static shapes everywhere: token lengths round up to `text_bucket`
multiples and mel lengths to `mel_bucket` multiples, so the jit cache
stays small and steady-state serving never recompiles.
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np


class ServerOverloaded(RuntimeError):
    """Raised by submit() when the request queue is at max_queue —
    callers (e.g. the HTTP front) should shed load (503)."""


@dataclass
class _Request:
    text: str
    alpha: float
    pitch_scale: float
    energy_scale: float
    speaker: int = 0                   # multi-speaker checkpoints only
    future: Future = field(default_factory=Future)
    deadline: Optional[float] = None   # time.monotonic() cutoff
    enqueued: float = 0.0              # time.monotonic() at submit


def _bucket(n: int, multiple: int, minimum: int) -> int:
    return max(((n + multiple - 1) // multiple) * multiple, minimum)


class TTSServer:
    """Thread-safe dynamic-batching synthesis server.

    vocoder: 'griffinlim' | 'wavernn' | 'hifigan'
    Returns int16 PCM at the checkpoint's sample rate.
    """

    def __init__(self, tts_checkpoint: str,
                 vocoder: str = 'griffinlim',
                 voc_checkpoint: Optional[str] = None,
                 max_batch: int = 8, max_wait_ms: float = 20.0,
                 text_bucket: int = 16, mel_bucket: int = 256,
                 fused: bool = False, fused_max_t: int = 1024,
                 max_queue: int = 64,
                 request_timeout_s: Optional[float] = 60.0,
                 mesh=None) -> None:
        from forwardtacotron_tpu.dsp.audio import DSP
        from forwardtacotron_tpu.text.cleaners import Cleaner
        from forwardtacotron_tpu.text.tokenizer import Tokenizer
        from forwardtacotron_tpu.utils.checkpoints import (
            load_tts_checkpoint)

        self.model, self.variables, self.config, _ = \
            load_tts_checkpoint(tts_checkpoint)
        self.dsp = DSP.from_config(self.config)
        self.cleaner = Cleaner.from_config(self.config)
        self.tokenizer = Tokenizer()
        self.vocoder = vocoder
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self.text_bucket = text_bucket
        self.mel_bucket = mel_bucket
        self.sample_rate = self.dsp.sample_rate
        # observability / tests; bounded so long-lived servers don't
        # accumulate one int per batch forever
        self.batch_sizes: 'deque[int]' = deque(maxlen=4096)
        # backpressure: bound on requests waiting in the queue;
        # submit() sheds load with ServerOverloaded beyond it
        self.max_queue = int(max_queue)
        # per-request deadline: requests still unstarted past it fail
        # with TimeoutError instead of occupying device batches
        self.request_timeout_s = request_timeout_s
        # optional Mesh with a 'data' axis: WaveRNN vocoding shards
        # the utterance batch across chips (models/wavernn.py
        # vocode_batch shard_map path)
        self.mesh = mesh

        # fused=True (neural vocoders): text -> int16 PCM in ONE
        # device program per batch — series, duration scaling, mel
        # decode, and the vocoder all inside a single jit, removing
        # two host round-trips per request group. The mel axis is
        # fixed at `fused_max_t` frames; batches whose output would
        # overflow it transparently fall back to the staged path.
        self.fused = bool(fused)
        self.fused_max_t = int(fused_max_t)
        self.voc_model = self.voc_variables = None
        self._voc_mu_law = False
        if vocoder == 'wavernn':
            from forwardtacotron_tpu.utils.checkpoints import (
                load_voc_checkpoint)
            self.voc_model, self.voc_variables, voc_config, _ = \
                load_voc_checkpoint(voc_checkpoint)
            self._voc_mu_law = DSP.from_config(voc_config).mu_law
        elif vocoder in ('hifigan', 'melgan'):
            # load_gan_vocoder dispatches on the file (`.fjax` configs
            # or torch state-dict sniffing), so a MelGAN `.fjax` from
            # train_hifigan.py works under either subcommand; the
            # vocode dispatch below keys on the loaded model type.
            from forwardtacotron_tpu.models.hifigan import (
                load_gan_vocoder)
            self.voc_model, self.voc_variables = load_gan_vocoder(
                voc_checkpoint, voc_type=vocoder)
        elif vocoder != 'griffinlim':
            raise ValueError(f'unknown vocoder: {vocoder}')
        if self.fused and vocoder not in ('hifigan', 'melgan', 'wavernn'):
            raise ValueError('fused serving needs a neural vocoder '
                             '(hifigan/melgan/wavernn)')

        self._jit_cache: Dict[Any, Any] = {}
        self._q: 'queue.Queue[Optional[_Request]]' = queue.Queue()
        self._closed = False
        # telemetry: counters + a bounded window of per-request
        # latencies for percentiles; read via stats() / GET /stats
        self._stats_lock = threading.Lock()
        self._started_at = time.monotonic()
        self._counters = {'submitted': 0, 'completed': 0, 'failed': 0,
                          'shed': 0, 'expired': 0, 'batches': 0}
        self._latency_window: 'deque' = deque(maxlen=1024)
        # Serializes the closed-check-then-put in submit() against
        # close(): without it a request enqueued between close()'s
        # sentinel and worker exit would leave its Future unresolved.
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- API

    def submit(self, text: str, alpha: float = 1.0,
               pitch_scale: float = 1.0,
               energy_scale: float = 1.0, speaker: int = 0) -> Future:
        """Enqueue a request; the Future resolves to int16 PCM.

        Raises ServerOverloaded when the queue is at max_queue (load
        shedding — map to HTTP 503)."""
        n_spk = getattr(self.model, 'n_speakers', 1)
        if n_spk > 1 and not 0 <= int(speaker) < n_spk:
            raise ValueError(f'speaker {speaker} out of range for a '
                             f'{n_spk}-speaker model')
        with self._submit_lock:
            if self._closed:
                raise RuntimeError('server is closed')
            if self._q.qsize() >= self.max_queue:
                self._count('shed')
                raise ServerOverloaded(
                    f'request queue full ({self.max_queue})')
            now = time.monotonic()
            deadline = None if self.request_timeout_s is None \
                else now + self.request_timeout_s
            req = _Request(text, float(alpha), float(pitch_scale),
                           float(energy_scale), speaker=int(speaker),
                           deadline=deadline, enqueued=now)
            self._count('submitted')
            self._q.put(req)
        return req.future

    def synthesize(self, text: str, alpha: float = 1.0,
                   pitch_scale: float = 1.0, energy_scale: float = 1.0,
                   timeout: Optional[float] = None,
                   speaker: int = 0) -> np.ndarray:
        return self.submit(text, alpha, pitch_scale,
                           energy_scale, speaker=speaker).result(timeout)

    def synthesize_long(self, text: str, alpha: float = 1.0,
                        pitch_scale: float = 1.0,
                        energy_scale: float = 1.0,
                        timeout: Optional[float] = None,
                        speaker: int = 0,
                        gap_ms: float = 120.0) -> np.ndarray:
        """Article-length synthesis: split `text` into sentences
        (text/segmenter.py), batch them through shared device
        programs, and concatenate the results with `gap_ms` of
        silence between sentences. Per-dispatch latency stays bounded
        by sentence length instead of the whole article."""
        out = list(self.synthesize_stream(
            text, alpha, pitch_scale, energy_scale, timeout=timeout,
            speaker=speaker, gap_ms=gap_ms, first_sentence_solo=False))
        return np.concatenate(out) if len(out) > 1 else out[0]

    def synthesize_stream(self, text: str, alpha: float = 1.0,
                          pitch_scale: float = 1.0,
                          energy_scale: float = 1.0,
                          timeout: Optional[float] = None,
                          speaker: int = 0,
                          gap_ms: float = 120.0,
                          first_sentence_solo: bool = True):
        """Streaming article synthesis: a generator yielding int16 PCM
        chunks (one per sentence, with `gap_ms` of silence between
        them) in text order, each as soon as it is synthesized. First
        audio arrives after the FIRST sentence's latency instead of
        the whole article's; later sentences synthesize while earlier
        audio plays. Sentences are submitted eagerly (without
        blocking) so the dynamic batcher can pack them into shared
        device programs; when the queue is full the generator blocks
        on its own oldest in-flight sentence rather than busy-spinning
        submit/shed.

        first_sentence_solo: hold the remaining sentences back for one
        batching window after submitting the first, so the batcher
        dispatches sentence 1 in its own (small, fast) batch — first
        audio at single-sentence latency even though the rest of the
        article batches densely behind it. synthesize_long turns this
        off (no streaming consumer, so dense batching wins)."""
        from forwardtacotron_tpu.text.segmenter import split_sentences
        sentences = split_sentences(text)
        if not sentences:
            raise ValueError('no synthesizable text')
        gap = np.zeros(int(self.sample_rate * gap_ms / 1000.0), np.int16)
        pending: deque = deque()
        next_i = 0
        for emitted in range(len(sentences)):
            # top up the in-flight window as far as the queue allows
            while next_i < len(sentences):
                if first_sentence_solo and next_i == 1:
                    # let the batcher's collect window close on the
                    # first sentence before enqueueing the rest
                    time.sleep(1.5 * self.max_wait_s + 0.002)
                    first_sentence_solo = False
                try:
                    pending.append(self.submit(
                        sentences[next_i], alpha, pitch_scale,
                        energy_scale, speaker=speaker))
                    next_i += 1
                except ServerOverloaded:
                    if next_i == 0:
                        raise      # queue full of OTHER callers' work
                    if not pending:
                        # everything of ours resolved but the queue is
                        # (still) full of other callers' work — back
                        # off and retry rather than busy-spinning
                        time.sleep(self.max_wait_s or 0.05)
                        continue
                    break
            pcm = pending.popleft().result(timeout)
            if emitted:
                yield gap
            yield pcm

    def close(self) -> None:
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ----------------------------------------------------- batch loop

    def _drain_closed(self) -> None:
        """Fail any requests still queued behind the close sentinel so
        no caller blocks forever on an orphaned Future."""
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                return
            if req is not None:
                req.future.set_exception(RuntimeError('server closed'))

    def _loop(self) -> None:
        import time
        while True:
            req = self._q.get()
            if req is None:
                self._drain_closed()
                return
            batch = [req]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._run_batch(batch)
                    self._drain_closed()
                    return
                batch.append(nxt)
            self._run_batch(batch)

    def _jit(self, key, builder):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = builder()
            self._jit_cache[key] = fn
        return fn

    # ------------------------------------------------ device programs
    # Shared by the batch path and warmup() so precompiled programs are
    # exactly the ones steady-state serving dispatches.

    def _speakers(self, reqs: Optional[List[_Request]],
                  B: int) -> Optional[np.ndarray]:
        """(B,) speaker ids for multi-speaker checkpoints, else None
        (single-speaker: the model takes no speaker argument pytree,
        keeping program signatures identical to before)."""
        if getattr(self.model, 'n_speakers', 1) <= 1:
            return None
        spk = np.zeros((B,), np.int32)
        if reqs is not None:
            spk[:len(reqs)] = [r.speaker for r in reqs]
        return spk

    def _series_program(self, tx: int, B: int):
        import jax
        model = self.model
        return self._jit(
            ('series', model, tx, B),
            lambda: jax.jit(lambda v, x, xl, spk: model.apply(
                v, x, method='predict_series', x_len=xl, speaker=spk)))

    def _gen_program(self, tx: int, B: int, max_t: int):
        import jax
        model = self.model
        return self._jit(
            ('gen', model, tx, B, max_t),
            lambda: jax.jit(lambda v, x, d, p, e, xl, spk, _mt=max_t:
                            model.apply(v, x, d, p, e, _mt,
                                        method='generate_from_series',
                                        x_len=xl, speaker=spk)))

    def _fused_program(self, tx: int, B: int, max_t: int):
        """tokens -> int16 PCM in ONE jitted program. Returns
        (pcm (B, total), mel_len (B,), wav_len (B,)); takes a seed
        scalar (drives WaveRNN sampling noise; unused by GANs)."""
        import jax
        import jax.numpy as jnp
        model, voc_model = self.model, self.voc_model
        key = ('fused', model, voc_model, tx, B, max_t)
        is_ar = self.vocoder == 'wavernn'
        if is_ar:
            from forwardtacotron_tpu.kernels.wavernn_sample import (
                pallas_supported)
            from forwardtacotron_tpu.models.wavernn import (
                TARGET_REFERENCE, TARGET_TPU, build_vocode_program)
            use_pallas = pallas_supported(voc_model)
            vocode = build_vocode_program(
                voc_model,
                target=TARGET_TPU if use_pallas else TARGET_REFERENCE,
                overlap=550,
                mu_law=self._voc_mu_law and voc_model.mode == 'RAW',
                use_pallas=use_pallas, pcm16=True)

        def build():
            def fn(v, vv, x, xl, a, ps, es, spk, seed):
                series = model.apply(v, x, method='predict_series',
                                     x_len=xl, speaker=spk)
                dur = series['dur'] / a[:, None]
                gen = model.apply(v, x, dur,
                                  series['pitch'] * ps[:, None],
                                  series['energy'] * es[:, None],
                                  max_t,
                                  method='generate_from_series',
                                  x_len=xl, speaker=spk)
                mel_len = gen['mel_len'].astype(jnp.int32)
                if is_ar:
                    wav_len = (mel_len - 1) * voc_model.hop_length
                    pcm = vocode(vv, gen['mel_post'], wav_len, seed)
                else:
                    wav = voc_model.apply(vv, gen['mel_post'])
                    pcm = (jnp.clip(wav, -1.0, 1.0)
                           * 32767.0).astype(jnp.int16)
                    wav_len = mel_len * (wav.shape[-1] // max_t)
                return pcm, gen['mel_len'], wav_len
            return jax.jit(fn)

        return self._jit(key, build)

    def warmup(self, batch_sizes=None, text_lens=None, mel_caps=None,
               vocoder: bool = True) -> Dict[str, Any]:
        """Precompile the device programs for the steady-state shape
        set so first requests don't block on 30s-3min XLA compiles.

        Runs each program once on dummy inputs (which also populates
        the persistent compile cache). Defaults are lean — one text
        bucket, one mel bucket, batch 1 and the max batch — widen the
        arguments to cover more of the shape lattice.

        Returns {'programs': n_compiled, 'seconds': wall}."""
        import jax.numpy as jnp
        t0 = time.monotonic()
        before = len(self._jit_cache)
        if batch_sizes is None:
            b_max = 1 if self.max_batch <= 1 else \
                1 << (self.max_batch - 1).bit_length()
            batch_sizes = sorted({1, b_max})
        if text_lens is None:
            text_lens = (self.text_bucket,)
        if mel_caps is None:
            mel_caps = (self.mel_bucket,)
        n_mels = int(self.config['dsp']['num_mels'])
        pad_val = -11.5129251
        for B in batch_sizes:
            for tl in text_lens:
                tx = _bucket(int(tl), self.text_bucket, self.text_bucket)
                x = np.ones((B, tx), np.int32)
                x_lens = np.full((B,), min(int(tl), tx), np.int32)
                spk = self._speakers(None, B)
                if self.fused:
                    fn = self._fused_program(tx, B, self.fused_max_t)
                    out = fn(self.variables, self.voc_variables,
                             jnp.asarray(x), jnp.asarray(x_lens),
                             jnp.ones((B,), jnp.float32),
                             jnp.ones((B,), jnp.float32),
                             jnp.ones((B,), jnp.float32), spk,
                             jnp.asarray(0, jnp.int32))
                    np.asarray(out[0])
                series_fn = self._series_program(tx, B)
                series = series_fn(self.variables, jnp.asarray(x),
                                   jnp.asarray(x_lens), spk)
                dur = np.asarray(series['dur'])
                for mt in mel_caps:
                    max_t = _bucket(int(mt), self.mel_bucket,
                                    self.mel_bucket)
                    gen_fn = self._gen_program(tx, B, max_t)
                    gen = gen_fn(self.variables, jnp.asarray(x),
                                 jnp.asarray(dur),
                                 jnp.asarray(series['pitch']),
                                 jnp.asarray(series['energy']),
                                 jnp.asarray(x_lens), spk)
                    np.asarray(gen['mel_post'])
            if vocoder and not self.fused:
                for mt in mel_caps:
                    max_t = _bucket(int(mt), self.mel_bucket,
                                    self.mel_bucket)
                    mels = [np.full((n_mels, max_t), pad_val,
                                    np.float32)] * B
                    self._vocode(mels)
        return {'programs': len(self._jit_cache) - before,
                'seconds': time.monotonic() - t0}

    def _run_batch(self, reqs: List[_Request]) -> None:
        # expire requests whose deadline passed while queued, so a
        # backlog can't keep burning device time on abandoned work
        now = time.monotonic()
        live = []
        for r in reqs:
            if r.deadline is not None and now > r.deadline:
                self._count('expired')
                r.future.set_exception(
                    TimeoutError('request deadline exceeded before '
                                 'synthesis started'))
            else:
                live.append(r)
        reqs = live
        # validate per-request so one bad input can't poison the batch
        valid, ids = [], []
        for r in reqs:
            try:
                seq = self.tokenizer(self.cleaner(r.text))
                if not seq:
                    raise ValueError(
                        f'empty token sequence for {r.text!r}')
            except BaseException as e:
                self._count('failed')
                r.future.set_exception(e)
                continue
            valid.append(r)
            ids.append(seq)
        if not valid:
            return
        self._count('batches')
        try:
            wavs = self._synthesize_batch(valid, ids)
            done = time.monotonic()
            with self._stats_lock:
                self._counters['completed'] += len(valid)
                for r in valid:
                    self._latency_window.append(done - r.enqueued)
            for r, wav in zip(valid, wavs):
                r.future.set_result(wav)
        except BaseException as e:
            self._count('failed', len(valid))
            for r in valid:
                if not r.future.done():
                    r.future.set_exception(e)

    def _count(self, key: str, n: int = 1) -> None:
        with self._stats_lock:
            self._counters[key] += n

    def stats(self) -> Dict[str, Any]:
        """Operational snapshot: counters, queue depth, batch-size and
        end-to-end latency percentiles over the recent window (1024
        requests). Served as JSON by GET /stats on the HTTP front."""
        with self._stats_lock:
            counters = dict(self._counters)
            lat = list(self._latency_window)
        out: Dict[str, Any] = dict(counters)
        out['queue_depth'] = self._q.qsize()
        out['uptime_s'] = round(time.monotonic() - self._started_at, 3)
        recent = list(self.batch_sizes)[-256:]
        out['mean_batch_size'] = (round(float(np.mean(recent)), 3)
                                  if recent else None)
        if lat:
            p = np.percentile(lat, [50, 95, 99])
            out['latency_s'] = {'p50': round(float(p[0]), 4),
                                'p95': round(float(p[1]), 4),
                                'p99': round(float(p[2]), 4),
                                'max': round(float(max(lat)), 4),
                                'window': len(lat)}
        else:
            out['latency_s'] = None
        return out

    def _synthesize_batch_fused(self, reqs: List[_Request],
                                ids: List[List[int]]
                                ) -> Optional[List[np.ndarray]]:
        """ONE device program: tokens -> int16 PCM for the whole
        group. Returns None when any output hits the fused mel cap
        (the caller then reruns through the staged path)."""
        import jax.numpy as jnp

        variables = self.variables
        voc_variables = self.voc_variables
        B_real = len(ids)
        B = 1 << (B_real - 1).bit_length() if B_real > 1 else 1
        x_lens = np.ones((B,), np.int32)
        x_lens[:B_real] = [len(i) for i in ids]
        tx = _bucket(int(x_lens.max()), self.text_bucket,
                     self.text_bucket)
        x = np.zeros((B, tx), np.int32)
        for i, seq in enumerate(ids):
            x[i, :len(seq)] = seq
        alphas = np.ones((B,), np.float32)
        p_scale = np.ones((B,), np.float32)
        e_scale = np.ones((B,), np.float32)
        alphas[:B_real] = [r.alpha for r in reqs]
        p_scale[:B_real] = [r.pitch_scale for r in reqs]
        e_scale[:B_real] = [r.energy_scale for r in reqs]
        max_t = self.fused_max_t

        run = self._fused_program(tx, B, max_t)
        self._fused_seed = getattr(self, '_fused_seed', 0) + 1
        pcm, mel_lens, wav_lens = run(
            variables, voc_variables, jnp.asarray(x),
            jnp.asarray(x_lens), jnp.asarray(alphas),
            jnp.asarray(p_scale), jnp.asarray(e_scale),
            self._speakers(reqs, B),
            jnp.asarray(self._fused_seed, jnp.int32))
        mel_lens = np.asarray(mel_lens)
        if int(mel_lens[:B_real].max()) >= max_t:
            return None                      # overflow: staged fallback
        self.batch_sizes.append(B_real)
        pcm = np.asarray(pcm)
        wav_lens = np.asarray(wav_lens)
        return [pcm[i, :int(wav_lens[i])] for i in range(B_real)]

    def _synthesize_batch(self, reqs: List[_Request],
                          ids: List[List[int]]) -> List[np.ndarray]:
        import jax.numpy as jnp

        if self.fused:
            out = self._synthesize_batch_fused(reqs, ids)
            if out is not None:
                return out

        self.batch_sizes.append(len(reqs))
        variables = self.variables
        B_real = len(ids)
        # pow-2 batch bucketing: a handful of compiled batch shapes
        # serves every group size
        B = 1 << (B_real - 1).bit_length() if B_real > 1 else 1
        x_lens = np.ones((B,), np.int32)
        x_lens[:B_real] = [len(i) for i in ids]
        tx = _bucket(int(x_lens.max()), self.text_bucket,
                     self.text_bucket)
        x = np.zeros((B, tx), np.int32)
        for i, seq in enumerate(ids):
            x[i, :len(seq)] = seq

        spk = self._speakers(reqs, B)
        series_fn = self._series_program(tx, B)
        series = series_fn(variables, jnp.asarray(x),
                           jnp.asarray(x_lens), spk)

        # per-request controls on the shared series pass (alpha
        # divides durations, exactly as the model's own alpha arg)
        alphas = np.ones((B,), np.float32)
        p_scale = np.ones((B,), np.float32)
        e_scale = np.ones((B,), np.float32)
        alphas[:B_real] = [r.alpha for r in reqs]
        p_scale[:B_real] = [r.pitch_scale for r in reqs]
        e_scale[:B_real] = [r.energy_scale for r in reqs]
        dur = np.asarray(series['dur']) / alphas[:, None]
        pitch = np.asarray(series['pitch']) * p_scale[:, None]
        energy = np.asarray(series['energy']) * e_scale[:, None]

        rounded = np.floor(np.maximum(dur, 0.0) + 0.5)
        totals = np.asarray(
            [rounded[i, :x_lens[i]].sum() for i in range(B)], np.int64)
        max_t = _bucket(int(totals.max()) + 1, self.mel_bucket,
                        self.mel_bucket)

        gen_fn = self._gen_program(tx, B, max_t)
        gen = gen_fn(variables, jnp.asarray(x), jnp.asarray(dur),
                     jnp.asarray(pitch), jnp.asarray(energy),
                     jnp.asarray(x_lens), spk)
        mel_lens = np.asarray(gen['mel_len'])
        mels = np.asarray(gen['mel_post'])        # (B, max_t, n_mels)
        per_item = [mels[i, :int(mel_lens[i])].T
                    for i in range(B_real)]       # drop pad rows

        return self._vocode(per_item)

    def _vocode(self, mels: List[np.ndarray]) -> List[np.ndarray]:
        if self.vocoder == 'wavernn':
            from forwardtacotron_tpu.models.wavernn import vocode_batch
            # pow-2 pad the lane-packed batch too, so the fused vocode
            # program compiles for a handful of batch shapes only
            n_real = len(mels)
            n = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
            padded = mels + [mels[-1]] * (n - n_real)
            wavs = vocode_batch(self.voc_model, self.voc_variables,
                                padded, mu_law=self._voc_mu_law,
                                pcm16=True, mesh=self.mesh)
            return wavs[:n_real]
        if self.vocoder in ('hifigan', 'melgan'):
            # dispatch on the LOADED generator type (a .fjax file may
            # carry either architecture regardless of the subcommand)
            from forwardtacotron_tpu.train.hifigan_trainer import (
                vocode_generator)
            return [vocode_generator(self.voc_model, self.voc_variables,
                                     m, pcm16=True) for m in mels]
        out = []
        for m in mels:
            wav = np.asarray(self.dsp.griffinlim(m))
            out.append((np.clip(wav, -1.0, 1.0)
                        * 32767.0).astype(np.int16))
        return out


def wav_bytes(pcm16: np.ndarray, sample_rate: int) -> bytes:
    """int16 PCM -> a complete RIFF/WAV file in memory."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.ascontiguousarray(pcm16, np.int16).tobytes())
    return buf.getvalue()


def wav_stream_header(sample_rate: int) -> bytes:
    """RIFF/WAV header for a live stream of unknown length: the RIFF
    and data chunk sizes are 0xFFFFFFFF, which players treat as
    'read until the connection closes' (the standard trick for
    chunked/live WAV over HTTP)."""
    import struct
    channels, bits = 1, 16
    byte_rate = sample_rate * channels * bits // 8
    return (b'RIFF' + struct.pack('<I', 0xFFFFFFFF) + b'WAVEfmt '
            + struct.pack('<IHHIIHH', 16, 1, channels, sample_rate,
                          byte_rate, channels * bits // 8, bits)
            + b'data' + struct.pack('<I', 0xFFFFFFFF))


def make_http_server(server: TTSServer, host: str = '127.0.0.1',
                     port: int = 8000):
    """Minimal stdlib HTTP front: POST /tts {"text", "alpha",
    "pitch_scale"|"amp", "energy_scale", "speaker",
    "split_sentences"} -> audio/wav; POST /tts_stream (same payload)
    -> chunked audio/wav streamed sentence-by-sentence as synthesis
    completes (first audio after one sentence's latency);
    GET /healthz -> 200 ok; GET /stats -> JSON telemetry (counters,
    queue depth, latency percentiles). Concurrent connections batch
    through the TTSServer's dynamic batcher."""
    import json
    from http.server import (BaseHTTPRequestHandler,
                             ThreadingHTTPServer)

    class Handler(BaseHTTPRequestHandler):
        # chunked transfer-encoding (the /tts_stream response) needs 1.1
        protocol_version = 'HTTP/1.1'

        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == '/healthz':
                body, ctype = b'ok', 'text/plain'
            elif self.path == '/stats':
                body = json.dumps(server.stats()).encode('utf-8')
                ctype = 'application/json'
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path not in ('/tts', '/tts_stream'):
                self.send_error(404)
                return
            try:
                n = int(self.headers.get('Content-Length', 0))
                payload = json.loads(self.rfile.read(n) or b'{}')
                text = payload['text']
                # bound the wait slightly past the server's own
                # deadline so a wedged batch can't hold the socket
                timeout = None if server.request_timeout_s is None \
                    else server.request_timeout_s + 10.0
                kwargs = dict(
                    alpha=float(payload.get('alpha', 1.0)),
                    pitch_scale=float(payload.get(
                        'pitch_scale', payload.get('amp', 1.0))),
                    energy_scale=float(payload.get('energy_scale',
                                                   1.0)),
                    speaker=int(payload.get('speaker', 0)),
                    timeout=timeout)
                if self.path == '/tts_stream':
                    self._stream_tts(text, kwargs)
                    return
                synth = (server.synthesize_long
                         if payload.get('split_sentences')
                         else server.synthesize)
                pcm = synth(text, **kwargs)
                body = wav_bytes(pcm, server.sample_rate)
                self.send_response(200)
                self.send_header('Content-Type', 'audio/wav')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except KeyError:
                self.send_error(400, 'missing "text"')
            except ValueError as e:
                self.send_error(400, str(e))
            except ServerOverloaded:
                self.send_response(503, 'overloaded')
                self.send_header('Retry-After', '1')
                self.send_header('Content-Length', '0')
                self.end_headers()
            except TimeoutError:
                self.send_error(504, 'request deadline exceeded')
            except Exception as e:  # pragma: no cover - defensive
                self.send_error(500, f'{type(e).__name__}: {e}')

        def _stream_tts(self, text: str, kwargs: dict) -> None:
            """Chunked-transfer streaming synthesis: the first PCM
            chunk is synthesized BEFORE the status line goes out (so
            overload/bad-input still map to proper status codes), then
            each sentence's audio is flushed to the client as soon as
            the device produces it."""
            chunks = server.synthesize_stream(text, **kwargs)
            first = next(chunks)           # errors -> outer handler
            self.send_response(200)
            self.send_header('Content-Type', 'audio/wav')
            self.send_header('Transfer-Encoding', 'chunked')
            self.end_headers()

            def write_chunk(b: bytes) -> None:
                self.wfile.write(f'{len(b):X}\r\n'.encode('ascii'))
                self.wfile.write(b)
                self.wfile.write(b'\r\n')
                self.wfile.flush()

            try:
                write_chunk(wav_stream_header(server.sample_rate)
                            + np.ascontiguousarray(
                                first, np.int16).tobytes())
                for pcm in chunks:
                    write_chunk(np.ascontiguousarray(
                        pcm, np.int16).tobytes())
                self.wfile.write(b'0\r\n\r\n')
            except Exception:
                # mid-stream failure: headers are out, so the only
                # correct signal is an aborted (unterminated) stream
                self.close_connection = True

    return ThreadingHTTPServer((host, port), Handler)
