package org.postgresql.core;

/**
 * Test-scope stub carrying the exact pgjdbc interface name that
 * graft.sinks.PgCopy.PgDriverCopyApi unwraps a Connection to via
 * reflection. Exists so the reflective adapter path actually executes in
 * the suite (the container has no pgjdbc jar); NOT a Postgres client.
 */
public interface BaseConnection extends java.sql.Connection {}
