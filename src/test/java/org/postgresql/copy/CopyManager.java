package org.postgresql.copy;

import java.io.IOException;
import java.io.InputStream;
import java.nio.charset.StandardCharsets;
import java.util.concurrent.ConcurrentLinkedQueue;

import org.postgresql.core.BaseConnection;

/**
 * Test-scope stub with the exact pgjdbc class name, constructor shape
 * (BaseConnection), and copyIn(String, InputStream) signature that
 * graft.sinks.PgCopy.PgDriverCopyApi resolves reflectively — so the
 * reflective production path executes end-to-end in the suite without a
 * database or the driver jar. Records each invocation for assertions;
 * returns the payload's line count, as a real COPY reports rows loaded.
 */
public class CopyManager {
    public static final ConcurrentLinkedQueue<String> SQLS = new ConcurrentLinkedQueue<>();
    public static final ConcurrentLinkedQueue<String> PAYLOADS = new ConcurrentLinkedQueue<>();

    public static void reset() {
        SQLS.clear();
        PAYLOADS.clear();
    }

    private final BaseConnection connection;

    public CopyManager(BaseConnection connection) {
        if (connection == null) {
            throw new IllegalArgumentException("CopyManager requires an unwrapped BaseConnection");
        }
        this.connection = connection;
    }

    public long copyIn(String sql, InputStream from) throws IOException {
        SQLS.add(sql);
        String payload = new String(from.readAllBytes(), StandardCharsets.UTF_8);
        PAYLOADS.add(payload);
        return payload.chars().filter(c -> c == '\n').count();
    }
}
