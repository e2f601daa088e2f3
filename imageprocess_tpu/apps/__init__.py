"""Interactive applications (matplotlib-based; the reference's Tkinter
GUIs re-imagined for display-capable sessions)."""
