"""The medallion pipeline: bronze -> silver -> gold orchestration."""
