"""Host-side stage pipelines (offline preprocessing)."""
