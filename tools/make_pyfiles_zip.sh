#!/bin/sh
# Package the library for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f spinneret_spark.zip
zip -qr spinneret_spark.zip spinneret_spark -x '*__pycache__*'
echo "wrote $(pwd)/spinneret_spark.zip"
