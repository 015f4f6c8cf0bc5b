"""End-to-end pipelines mirroring the reference's entry points
(SURVEY.md §3): MC acceptance, tiling, occupancy, bias voltage."""
