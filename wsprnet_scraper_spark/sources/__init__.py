from .tables import load, load_events

__all__ = ["load", "load_events"]
