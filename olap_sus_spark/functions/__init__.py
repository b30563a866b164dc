"""Scalar-function layer: decode ladders, calendar attributes, hashing.

These are the Spark-native equivalents of the reference's CASE-decode tables
(/root/reference/scripts/init.sql:66-91) and withColumn decode ladders
(/root/reference/dags/spark_script_sinasc.py:62-135).  Everything is a
Catalyst ``Column`` expression — JVM-side, whole-stage-codegen friendly, no
Python UDFs.
"""
