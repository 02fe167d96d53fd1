package org.apache.spark.sql.execution.datasources.parquet;

import java.io.IOException;

import org.apache.parquet.hadoop.ParquetFileReader;
import org.apache.parquet.schema.MessageType;

/**
 * Java bridge for the package-private {@code ParquetRowGroupReader}
 * plumbing: initializes a {@link VectorizedParquetRecordReader} over an
 * already-opened (and row-group-filtered) {@link ParquetFileReader}.
 * Java because Scala cannot reference the package-private nested types
 * even from the same package.
 */
public final class GraftRowGroupBridge {
  private GraftRowGroupBridge() {}

  public static void init(
      VectorizedParquetRecordReader reader,
      MessageType fileSchema,
      MessageType requestedSchema,
      final ParquetFileReader fileReader,
      int totalRowCount) throws IOException {
    reader.initialize(
        fileSchema,
        requestedSchema,
        new SpecificParquetRecordReaderBase.ParquetRowGroupReader() {
          @Override
          public org.apache.parquet.column.page.PageReadStore readNextRowGroup()
              throws IOException {
            // Must pair with getFilteredRecordCount(): when a record filter
            // is set, parquet-mr's column-index (page-level) filtering is on
            // by default, and the filtered count only matches the pages the
            // FILTERED read returns. The unfiltered readNextRowGroup() would
            // hand back more rows than the count on multi-page row groups,
            // truncating the read after a prefix. This mirrors Spark's own
            // ParquetRowGroupReaderImpl.
            return fileReader.readNextFilteredRowGroup();
          }

          @Override
          public void close() throws IOException {
            fileReader.close();
          }
        },
        totalRowCount);
  }
}
