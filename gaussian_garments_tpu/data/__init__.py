"""Data layer: frame loaders (s2), the (sequence, frame, camera) dataset (s3),
and the synthetic garment benchmark used by the integration tests (SURVEY.md
§4: "synthetic dataset generator ... standing in for ActorsHQ")."""
