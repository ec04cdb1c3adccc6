"""Sources & sinks (SURVEY.md §2.1): fetch UDFs (S1/S2), CSV table
scan/sink with the reference's on-disk encoding (S3/S5), export/serving
emitters (S8/S9)."""
