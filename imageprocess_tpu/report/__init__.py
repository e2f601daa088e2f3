"""Host-side report writers: CSV/XLSX tables, PNG/TIFF image exports,
PPTX decks.  These consume device results; nothing here runs on TPU."""

from . import excel, render  # noqa: F401
