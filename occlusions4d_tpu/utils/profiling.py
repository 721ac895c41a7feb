'''
Tracing / profiling subsystem.

The reference only has manual time.time() deltas around loader/model init
(/root/reference/train.py:68-74,181-185) and an unused torch profiler import
(/root/reference/model/implicit.py:13). Here profiling is first-class:

  * PhaseTimer: per-phase wall-clock accumulation for the step loop (data / step /
    sync / log), reported per epoch;
  * device_trace: context manager around jax.profiler.trace for XLA-level traces
    viewable in TensorBoard/Perfetto;
  * annotate: jax.profiler.TraceAnnotation passthrough for custom spans.

Note for tunneled-TPU machines: host-side wall clock around a dispatch does NOT
equal device time (async dispatch; block_until_ready may return early). PhaseTimer
measures the host's view, which is what the step loop actually pays.
'''

import contextlib
import time
from collections import defaultdict

__all__ = ['PhaseTimer', 'device_trace', 'annotate']


class PhaseTimer:
    '''Accumulates wall time per named phase across a loop.'''

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self):
        '''name -> (total_s, count, mean_ms) sorted by total descending.'''
        out = {}
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            tot = self.totals[name]
            cnt = max(self.counts[name], 1)
            out[name] = (tot, self.counts[name], tot / cnt * 1000.0)
        return out

    def report(self, logger=None, prefix=''):
        lines = [f'{prefix}{n}: {tot:.2f}s total, {cnt} calls, {ms:.1f} ms/call'
                 for n, (tot, cnt, ms) in self.summary().items()]
        text = '\n'.join(lines)
        if logger is not None:
            logger.info('Phase timing:\n' + text)
        return text

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir, enabled=True):
    '''XLA-level profiler trace (view with TensorBoard's profile plugin).'''
    if not enabled or not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    '''Named span visible in device traces.'''
    import jax
    return jax.profiler.TraceAnnotation(name)
