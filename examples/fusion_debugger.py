"""White-box tracing of the probability pipeline with FusionDebugger."""

from bayesian_bm25_tpu import BayesianProbabilityTransform, FusionDebugger

transform = BayesianProbabilityTransform(alpha=0.8, beta=4.0, base_rate=0.02)
debugger = FusionDebugger(transform)

# Full per-document trace: BM25 + vector signal, fused.
trace_a = debugger.trace_document(
    bm25_score=9.5, tf=4.0, doc_len_ratio=0.7, cosine_score=0.55,
    doc_id="doc_A",
)
trace_b = debugger.trace_document(
    bm25_score=5.0, tf=2.0, doc_len_ratio=1.4, cosine_score=0.72,
    doc_id="doc_B",
)

print(debugger.format_trace(trace_a))
print()
print(debugger.format_summary(trace_a))
print(debugger.format_summary(trace_b))

print()
print(debugger.format_comparison(debugger.compare(trace_a, trace_b)))

print()
print(debugger.format_not(debugger.trace_not(0.8, name="spam_topic")))
