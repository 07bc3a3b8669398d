from .tracing import Span, Tracer, get_tracer, span

__all__ = ["Span", "Tracer", "get_tracer", "span"]
