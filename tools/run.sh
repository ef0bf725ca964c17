#!/bin/bash
# Direct-JVM runner for graft mains (bypasses sbt; scala-library rides in /opt/spark/jars).
# Usage: [GRAFT_JVM_OPTS="-Dspark.eventLog.enabled=true ..."] tools/run.sh <MainClass> [args...]
MAIN=$1; shift
exec java -Xmx8g -XX:+UseG1GC $GRAFT_JVM_OPTS -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "graft.$MAIN" "$@"
