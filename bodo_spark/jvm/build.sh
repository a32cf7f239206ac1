#!/bin/sh
# Rebuild bodo-localfs.jar (pure-JVM chmod for Hadoop local FS).
# Requires a JDK 17 and the Spark distribution's hadoop-client-api jar.
set -e
cd "$(dirname "$0")"
HADOOP_JAR=$(ls /opt/spark/jars/hadoop-client-api-*.jar | head -1)
javac --release 17 -cp "$HADOOP_JAR" -d classes src/bodospark/fs/FastLocalFileSystem.java
jar cf bodo-localfs.jar -C classes .
rm -rf classes
