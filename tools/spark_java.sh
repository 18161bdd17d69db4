#!/usr/bin/env bash
# Launch a JVM against the Spark jars with the SAME module options
# spark-submit/spark-class would add (org.apache.spark.launcher
# .JavaModuleOptions). A bare `java -cp` run lacks them, and the gap is
# INVISIBLE until blocks spill to disk: Kryo's FieldSerializer then needs
# reflective access to java.nio / java.lang.invoke internals and every
# spilling task dies with "Unable to create serializer ... HeapByteBuffer /
# SerializedLambda" — found in r10 when the x100 scale stress pushed
# pagerank/kcore localCheckpoint blocks past memory for the first time
# (gate/bench scales never spill, so ten rounds of bare-java runs never
# hit it).
#
#   tools/spark_java.sh [-Xmx96g ...] -cp "classes:/opt/spark/jars/*" Main ...
set -euo pipefail
OPTS="-XX:+IgnoreUnrecognizedVMOptions
  --add-modules=jdk.incubator.vector
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
  --add-opens=java.security.jgss/sun.security.krb5=ALL-UNNAMED
  -Djdk.reflect.useDirectMethodHandle=false
  -Dio.netty.tryReflectionSetAccessible=true"
# shellcheck disable=SC2086
exec java $OPTS "$@"
