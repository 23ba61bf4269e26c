"""Training-data-pipeline functions: text analysis, exact/fuzzy dedup,
similarity search, multimodal column plumbing. All column expressions are
built-in ``pyspark.sql.functions`` (JVM-side, codegen'd) unless a Pandas
UDF is unavoidable; every operator avoids driver-side collects so it
scales with partition count."""
